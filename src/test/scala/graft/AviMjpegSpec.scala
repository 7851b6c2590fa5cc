package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

/** MJPEG-in-AVI frame sampling ([[Multimodal.aviJpegChunks]] +
  * [[Multimodal.frameSample]]'s avi path): the RIFF chunk walk on
  * constructed containers (flat, rec-nested, lying sizes), even
  * frame picking, real JPEG decode → PNG re-encode, and the
  * degrade-to-stub contract for undecodable payloads.
  */
class AviMjpegSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** A solid-gray w×h JPEG via the JDK writer. */
  private def grayJpeg(v: Int, w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    try { g2.setColor(new java.awt.Color(v, v, v)); g2.fillRect(0, 0, w, h) }
    finally g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpeg").next()
    val out = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try { writer.setOutput(out); writer.write(img) }
    finally { writer.dispose(); out.close() }
    bos.toByteArray
  }

  private def le32(n: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(n).array()

  private def chunk(fourcc: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    fourcc.getBytes("US-ASCII") ++ le32(payload.length) ++ payload ++ pad
  }

  private def list(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", listType.getBytes("US-ASCII") ++ body)

  /** Minimal MJPEG AVI: RIFF/AVI wrapping LIST/movi of 00dc chunks. */
  private def mjpegAvi(frames: Seq[Array[Byte]],
                       recNested: Boolean = false): Array[Byte] = {
    val dcs = frames.map(f => chunk("00dc", f))
    val moviBody =
      if (recNested) dcs.map(dc => list("rec ", dc)).flatten.toArray
      else dcs.flatten.toArray
    val body = "AVI ".getBytes("US-ASCII") ++ list("movi", moviBody)
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Mean luminance of a decoded image's pixels. */
  private def meanLum(png: Array[Byte]): Double = {
    val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val vs = for (y <- 0 until im.getHeight; x <- 0 until im.getWidth) yield {
      val rgb = im.getRGB(x, y)
      (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587
        + (rgb & 0xff) * 114) / 1000.0
    }
    vs.sum / vs.size
  }

  test("aviJpegChunks walks flat and rec-nested movi lists in frame order") {
    val frames = (0 until 5).map(i => grayJpeg(40 * i + 20))
    for (nested <- Seq(false, true)) {
      val avi = mjpegAvi(frames, recNested = nested)
      assert(Multimodal.sniffFormat(avi) === "avi")
      val chunks = Multimodal.aviJpegChunks(avi)
      assert(chunks.length === 5, s"nested=$nested")
      chunks.zip(frames).foreach { case ((off, len), f) =>
        assert(len === f.length)
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(avi, off, off + len), f))
      }
    }
  }

  test("lying chunk sizes and non-JPEG payloads degrade, never throw") {
    val good = grayJpeg(100)
    val avi = mjpegAvi(Seq(good))
    // truncate mid-frame: the walk stops, zero or fewer frames
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - good.length / 2)
    assert(Multimodal.aviJpegChunks(cut).isEmpty)
    // a 00dc chunk that is not JPEG is skipped
    val junk = mjpegAvi(Seq("not a jpeg at all".getBytes("US-ASCII")))
    assert(Multimodal.aviJpegChunks(junk).isEmpty)
    assert(Multimodal.aviJpegChunks(Array.emptyByteArray).isEmpty)
    assert(Multimodal.aviJpegChunks("RIFF".getBytes("US-ASCII")).isEmpty)
  }

  test("frameSample avi path: n real frames, evenly picked, PNG re-encoded") {
    val spark2 = spark
    import spark2.implicits._
    // 6 stored frames on a brightness ladder; n=4 picks 0, 2, 3, 5
    val frames = (0 until 6).map(i => grayJpeg(40 * i + 15))
    val blobs = Seq((1L, mjpegAvi(frames))).toDF("id", "data")
    val out = Multimodal.frameSample(blobs, n = 4).collect()
      .sortBy(_.frame_idx)
    assert(out.length === 4)
    assert(out.map(_.frame_idx).toSeq === Seq(0L, 1L, 2L, 3L))
    out.foreach(f => assert(Multimodal.sniffFormat(f.frame) === "png"))
    val lums = out.map(f => meanLum(f.frame)).toSeq
    val want = Seq(0, 2, 3, 5).map(i => 40.0 * i + 15)
    lums.zip(want).foreach { case (got, w) =>
      assert(math.abs(got - w) < 6.0, s"got $got want ~$w") // JPEG loss margin
    }
    // strictly increasing ladder survives the decode
    assert(lums === lums.sorted)
  }

  test("fewer stored frames than n repeats; undecodable avi falls back to byte spans") {
    val spark2 = spark
    import spark2.implicits._
    val one = mjpegAvi(Seq(grayJpeg(90)))
    val broken = {
      // valid walk, JPEG SOI present, but the codec rejects the bytes
      val fake = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1, 2, 3)
      mjpegAvi(Seq(fake))
    }
    val blobs = Seq((1L, one), (2L, broken)).toDF("id", "data")
    val byId = Multimodal.frameSample(blobs, n = 3).collect()
      .groupBy(_.id).map { case (k, v) => k -> v.sortBy(_.frame_idx) }
    // one stored frame, n=3 → the same frame three times
    val ones = byId(1L).map(f => meanLum(f.frame))
    assert(ones.length === 3)
    ones.foreach(l => assert(math.abs(l - 90.0) < 6.0))
    // undecodable → byte-span stub: concatenation re-assembles the blob
    val spans = byId(2L).map(_.frame)
    assert(spans.map(_.length).sum === broken.length)
  }
}
