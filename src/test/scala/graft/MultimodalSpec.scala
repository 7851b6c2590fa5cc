package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("binaryFile source reads raw blobs with length metadata") {
    val df = Multimodal.readBinaryFiles(spark, "/root/reference/files/*.bin")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("length") === r.getAs[Array[Byte]]("content").length.toLong)
    }
  }

  test("blob table schema: binary data + typed metadata struct") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val schema = blobs.schema
    assert(schema("data").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val r = blobs.head()
    assert(r.getAs[Array[Byte]]("data").nonEmpty)
  }

  test("resize caps bytes at w*h, keeps order, and rewrites meta") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val out = Multimodal.resized(blobs, 8, 4).collect()
    val srcLen = blobs.selectExpr("id", "octet_length(data) AS n").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Int]("n")).toMap
    out.foreach { r =>
      val d = r.getAs[Array[Byte]]("data")
      assert(d.length === math.min(srcLen(r.getAs[Long]("id")), 32))
      assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("width") === 8)
    }
    // subsampling preserves content: a resized blob's bytes all occur
    // in the source in order (stride sampling never reorders)
    val one = Multimodal.asBlobTable(
      spark.createDataFrame(Seq((1L, "abcdefghijklmnop"))).toDF("doc_id", "text"),
      "doc_id", "text")
    val d = Multimodal.resized(one, 2, 2).head().getAs[Array[Byte]]("data")
    assert(new String(d, "UTF-8") === "aeim") // stride 4 over 16 bytes
  }

  test("frameSample yields n frames whose concatenation is the blob") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val frames = Multimodal.frameSample(blobs, 4).collect()
      .groupBy(_.id).map { case (id, fs) =>
        id -> fs.sortBy(_.frame_idx).map(_.frame).reduce(_ ++ _)
      }
    val src = blobs.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Array[Byte]]("data")).toMap
    assert(frames.size === src.size)
    frames.foreach { case (id, joined) => assert(joined.sameElements(src(id))) }
    // short-blob edge: 2 bytes into 4 frames = three empty + the rest
    val tiny = Multimodal.asBlobTable(
      spark.createDataFrame(Seq((9L, "xy"))).toDF("doc_id", "text"),
      "doc_id", "text")
    val t = Multimodal.frameSample(tiny, 4).collect().sortBy(_.frame_idx)
    assert(t.map(_.frame.length).toSeq === Seq(0, 0, 0, 2))
  }

  // --- real image decode (javax.imageio — JDK-only, public API) ---

  private def pngBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("PNG decode touches real pixels: exact dims, histogram, checksum") {
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    // left half black (lum 0 → bucket 0), right half white (lum 255 → 15)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val bytes = pngBytes(img)
    assert(Multimodal.sniffFormat(bytes) === "png")
    val f = Multimodal.decode(7L, bytes)
    assert(f.format === "png")
    assert(f.width === 4 && f.height === 2)
    assert(f.n_bytes === bytes.length.toLong)
    assert(f.head_histogram(0) === 4 && f.head_histogram(15) === 4)
    assert(f.head_histogram.sum === 8) // every pixel counted exactly once
    // checksum folds the row-major luminance stream: 0,0,255,255 ×2
    val lums = Seq(0, 0, 255, 255, 0, 0, 255, 255)
    assert(f.checksum === lums.foldLeft(0L)((a, b) => a * 31 + b))
  }

  test("PNG decode: BT.601 luminance buckets for pure R/G/B pixels") {
    val img = new java.awt.image.BufferedImage(
      3, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000) // lum 255*299/1000 = 76  → bucket 4
    img.setRGB(1, 0, 0x00ff00) // lum 255*587/1000 = 149 → bucket 9
    img.setRGB(2, 0, 0x0000ff) // lum 255*114/1000 = 29  → bucket 1
    val f = Multimodal.decode(1L, pngBytes(img))
    assert(f.head_histogram(4) === 1)
    assert(f.head_histogram(9) === 1)
    assert(f.head_histogram(1) === 1)
    assert(f.head_histogram.sum === 3)
  }

  test("JPEG decode: real dims, full pixel coverage, deterministic") {
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpeg", bos)
    val bytes = bos.toByteArray
    assert(Multimodal.sniffFormat(bytes) === "jpeg")
    val f = Multimodal.decode(2L, bytes)
    assert(f.format === "jpeg")
    assert(f.width === 8 && f.height === 8)
    assert(f.head_histogram.sum === 64)
    // lossy, but a solid mid-gray block decodes to ~lum 128 (bucket 8 ±1)
    assert(f.head_histogram.slice(7, 10).sum === 64,
      s"luminance drifted: ${f.head_histogram.toSeq}")
    val again = Multimodal.decode(2L, bytes)
    assert(f.checksum === again.checksum &&
      f.head_histogram.toSeq === again.head_histogram.toSeq)
  }

  test("decodeImage refuses over-cap pixel counts from the header alone") {
    // a decompression bomb declares huge dims in a tiny header; the
    // guard must reject on header dims BEFORE any pixel allocation.
    // 4×2 = 8 px: cap at 7 → refused, cap at 8 → decoded.
    val img = new java.awt.image.BufferedImage(
      4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = pngBytes(img)
    assert(Multimodal.decodeImage(1L, bytes, "png", maxPixels = 7L).isEmpty)
    val ok = Multimodal.decodeImage(1L, bytes, "png", maxPixels = 8L)
    assert(ok.nonEmpty && ok.get.width === 4 && ok.get.height === 2)
  }

  test("decode dispatch: truncated/lying magic falls back to the stub") {
    // PNG signature followed by garbage: sniffs png, ImageIO rejects it
    val lying = Array[Byte](0x89.toByte, 'P', 'N', 'G', 1, 2, 3, 4, 5, 6)
    val f = Multimodal.decode(3L, lying)
    assert(f.format === "bin" && f.width === 0 && f.height === 0)
    assert(f.checksum === Multimodal.decodeStub(3L, lying).checksum)
  }

  test("extractFeatures routes a mixed media/text corpus per-row") {
    val img = new java.awt.image.BufferedImage(
      2, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 2) img.setRGB(x, y, 0xffffff)
    val png = pngBytes(img)
    val txt = "just text".getBytes("UTF-8")
    val rows = spark.createDataFrame(Seq((1L, png), (2L, txt)))
      .toDF("id", "data")
    val fs = Multimodal.extractFeatures(rows).collect().sortBy(_.id)
    assert(fs(0).format === "png" && fs(0).width === 2 && fs(0).height === 2)
    assert(fs(0).head_histogram(15) === 4)
    assert(fs(1).format === "bin" && fs(1).width === 0)
    assert(fs(1).n_bytes === txt.length.toLong)
  }

  test("feature extraction is deterministic and matches the stub contract") {
    val blobs = Multimodal.asBlobTable(
      Tables.documents(spark, SparkSuite.sf0001), "doc_id", "text")
    val a = Multimodal.extractFeatures(blobs).collect().sortBy(_.id)
    val b = Multimodal.extractFeatures(blobs).collect().sortBy(_.id)
    assert(a.map(f => (f.id, f.n_bytes, f.checksum)).toSeq ===
           b.map(f => (f.id, f.n_bytes, f.checksum)).toSeq)
    // n_bytes equals the utf-8 length of the source text
    val lens = Tables.documents(spark, SparkSuite.sf0001)
      .selectExpr("doc_id", "octet_length(text) AS n").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("n").toLong).toMap
    a.take(50).foreach(f => assert(f.n_bytes === lens(f.id)))
    // histogram buckets sum to min(256, n_bytes)
    a.take(50).foreach(f =>
      assert(f.head_histogram.sum.toLong === math.min(256L, f.n_bytes)))
  }
}
