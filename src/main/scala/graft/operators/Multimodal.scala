package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media blob. */
case class MediaMeta(format: String, width: Int, height: Int)

/** One media row: opaque bytes + typed metadata. */
case class MediaBlob(id: Long, data: Array[Byte], meta: MediaMeta)

/** Deterministic features extracted from one blob. For decoded images
  * (`format` png/jpeg) width/height are the REAL pixel dimensions and
  * `head_histogram` is a 16-bucket luminance histogram over every
  * pixel; for everything else dimensions are 0 and the histogram is
  * over the first 256 raw bytes ([[Multimodal.decodeStub]]) — with
  * `format` carrying the sniffed container label ("wav"/"aiff"/"au"
  * for audio, whose real decode is [[Multimodal.audioMeta]]; "bin"
  * for unrecognized bytes). */
case class MediaFeatures(id: Long, n_bytes: Long, format: String,
                         width: Int, height: Int, checksum: Long,
                         head_histogram: Array[Int])

/** One sampled frame of a blob (video frame-sample shape). */
case class MediaFrame(id: Long, frame_idx: Long, frame: Array[Byte])

/** Real audio-container metadata parsed from one blob's header. */
case class AudioMeta(id: Long, channels: Int, sample_rate_hz: Int,
                     frames: Long, duration_ms: Double)

/** Multimodal (image/audio/video) column plumbing: blobs are opaque
  * `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batch-wise over partitions.
  *
  * IMAGE decode is REAL: [[decode]] sniffs the magic bytes and routes
  * PNG/JPEG blobs through the JDK's `javax.imageio` (no external
  * codec deps), extracting actual pixel dimensions, a 16-bucket
  * luminance histogram over every pixel, and a pixel-stream checksum.
  * AUDIO decode is REAL too: [[audioMeta]] parses WAV/AIFF/AU headers
  * with `javax.sound.sampled` (channels, sample rate, frames,
  * duration). Non-media bytes — and media the platform stack rejects
  * — fall back to [[decodeStub]], the deterministic byte-level
  * stand-in, so a mixed corpus never errors mid-partition; stub rows
  * still carry the SNIFFED format label (a wav blob produces format
  * "wav" with byte-level features from [[decode]] — its pixel-shaped
  * fields don't apply). VIDEO codecs are not in the JDK; those
  * formats take the stub path, with the same bytes-in/features-out
  * contract a real codec would slot into. The plumbing is scale-true
  * throughout: the schema, the binaryFile source, the mapPartitions
  * batch boundary (one fused narrow stage, no shuffle, no driver
  * involvement), and the typed Dataset output.
  */
object Multimodal {

  /** Read raw files as blobs via Spark's binaryFile source. */
  def readBinaryFiles(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("length"), col("content"))

  /** Wrap a text table as a blob table (deterministic stand-in for a
    * media corpus: bytes = UTF-8 of the text, metadata faked from the
    * content). Demonstrates the binary + struct schema end-to-end. */
  def asBlobTable(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      col(textCol).cast("binary").as("data"),
      struct(lit("txt").as("format"),
             (length(col(textCol)) % 1024).cast("int").as("width"),
             lit(1).as("height")).as("meta"))

  /** Byte-level fallback features for NON-media blobs (and bytes a
    * codec rejects): checksum over the raw stream, 16-bucket histogram
    * of the first 256 bytes, no dimensions. Same contract as the real
    * decoder — Array[Byte] => features — so the dispatch in [[decode]]
    * is the only place that tells them apart. */
  def decodeStub(id: Long, data: Array[Byte]): MediaFeatures = {
    var checksum = 0L
    val hist = new Array[Int](16)
    var i = 0
    while (i < data.length) {
      checksum = checksum * 31 + (data(i) & 0xff)
      if (i < 256) hist((data(i) & 0xff) % 16) += 1
      i += 1
    }
    MediaFeatures(id, data.length.toLong, "bin", 0, 0, checksum, hist)
  }

  /** Magic-byte sniff: "png" / "jpeg" / "wav" / "aiff" / "au" /
    * "bin". Container formats are identified by their signature
    * bytes, never by path extension — at corpus scale extensions
    * lie. The three audio magics cover every format the JDK
    * AudioSystem ships a reader for. */
  def sniffFormat(data: Array[Byte]): String =
    if (data.length >= 8 && (data(0) & 0xff) == 0x89 && data(1) == 'P' &&
        data(2) == 'N' && data(3) == 'G') "png"
    else if (data.length >= 3 && (data(0) & 0xff) == 0xff &&
        (data(1) & 0xff) == 0xd8 && (data(2) & 0xff) == 0xff) "jpeg"
    else if (data.length >= 12 && data(0) == 'R' && data(1) == 'I' &&
        data(2) == 'F' && data(3) == 'F' && data(8) == 'W' &&
        data(9) == 'A' && data(10) == 'V' && data(11) == 'E') "wav"
    else if (data.length >= 12 && data(0) == 'F' && data(1) == 'O' &&
        data(2) == 'R' && data(3) == 'M' && data(8) == 'A' &&
        data(9) == 'I' && data(10) == 'F') "aiff" // AIFF or AIFC
    else if (data.length >= 4 && data(0) == '.' && data(1) == 's' &&
        data(2) == 'n' && data(3) == 'd') "au"
    else "bin"

  /** The formats [[audioMeta]] attempts — exactly the JDK
    * AudioSystem's built-in readers. */
  private val AudioFormats = Set("wav", "aiff", "au")

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG — public,
    * dependency-free codecs): actual pixel width/height, a 16-bucket
    * histogram of 8-bit luminance (ITU-R BT.601 integer weights,
    * bucket = lum >> 4), and a checksum folded over the luminance
    * stream in row-major order. Pixels are fetched with one bulk
    * `getRGB` per row — not per pixel — so the ColorModel conversion
    * is amortized; a fancier path would read the Raster directly, but
    * per-row bulk is within 2× of it and handles every color model.
    *
    * Hardened for hostile corpora: dimensions are read from the
    * HEADER before any pixel allocation — a decompression bomb (a
    * few-KB file declaring 50k×50k pixels) is refused at `maxPixels`
    * (default 2^26 ≈ 67 Mpx, a ~256 MB ARGB buffer) instead of
    * OOMing the executor — and ANY non-fatal decoder throw (the JDK
    * codecs raise CMMException / IllegalArgumentException / AIOOBE on
    * fuzzed input, not just IOException) yields None, so the caller
    * falls back to [[decodeStub]] and a single bad blob can never
    * fail the task. */
  def decodeImage(id: Long, data: Array[Byte], format: String,
                  maxPixels: Long = 1L << 26): Option[MediaFeatures] =
    try {
      val stream = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(stream, true, true)
            // header-only dims: a bomb announces its size in a few KB;
            // refuse before allocating w*h pixels
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > maxPixels) None
            else {
              val im = reader.read(0)
              val hist = new Array[Int](16)
              var checksum = 0L
              val row = new Array[Int](w)
              var y = 0
              while (y < h) {
                im.getRGB(0, y, w, 1, row, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = row(x)
                  val lum = (((rgb >> 16) & 0xff) * 299 +
                    ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
                  checksum = checksum * 31 + lum
                  hist(lum >> 4) += 1
                  x += 1
                }
                y += 1
              }
              Some(MediaFeatures(id, data.length.toLong, format, w, h,
                checksum, hist))
            }
          } finally reader.dispose()
        }
      } finally if (stream != null) stream.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** The per-blob decode dispatch: sniff, decode media formats for
    * real, fall back to byte-level features for everything else.
    * Audio blobs (wav/aiff/au) keep the sniffed format label but take
    * the byte-level feature path — their REAL decode surface is
    * [[audioMeta]], whose output (channels / rate / frames /
    * duration) has audio semantics that don't fit the pixel-shaped
    * [[MediaFeatures]]. */
  def decode(id: Long, data: Array[Byte]): MediaFeatures =
    sniffFormat(data) match {
      case f @ ("png" | "jpeg") =>
        decodeImage(id, data, f).getOrElse(decodeStub(id, data))
      case f if AudioFormats(f) => decodeStub(id, data).copy(format = f)
      case _ => decodeStub(id, data)
    }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV /
    * AIFF / AU — public, dependency-free): channels, sample rate,
    * frame count and duration parsed from the actual container header
    * by the platform AudioSystem, not by trusting our own arithmetic.
    * Returns None for bytes the audio stack rejects (caller decides
    * whether to drop or route to byte-level features); any non-fatal
    * parser throw is contained the same way as [[decodeImage]]'s. */
  def decodeAudioMeta(id: Long, data: Array[Byte]): Option[AudioMeta] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(data))
      try {
        val f = ais.getFormat
        val frames = ais.getFrameLength
        val durMs =
          if (f.getFrameRate > 0 && frames >= 0)
            frames * 1000.0 / f.getFrameRate
          else -1.0
        Some(AudioMeta(id, f.getChannels, f.getSampleRate.toInt, frames, durMs))
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Audio metadata table over blob partitions: one row per blob the
    * audio stack can parse (wav/aiff/au by magic bytes; non-audio
    * rows are skipped — this is the audio-modality projection of a
    * mixed corpus, not a per-row feature map). Blobs that SNIFF as
    * audio but fail the real parse are dropped AND counted in the
    * named accumulator `graft.audioMeta.undecodable` — a drop is
    * never silent (upper bound under task retries; report, don't
    * gate). Same narrow mapPartitions boundary as
    * [[extractFeatures]]: no shuffle, codec init amortized per task. */
  def audioMeta(blobs: DataFrame): Dataset[AudioMeta] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val undecodable =
      spark.sparkContext.longAccumulator("graft.audioMeta.undecodable")
    blobs.select(col("id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, data) =>
        if (AudioFormats(sniffFormat(data))) {
          val m = decodeAudioMeta(id, data)
          if (m.isEmpty) undecodable.add(1L)
          m
        } else None
      })
  }

  /** Wrap a text table as REAL WAV blobs (PCM 16-bit mono @ 8 kHz:
    * the text's UTF-8 bytes, truncated to an even length, become the
    * sample payload inside a correct RIFF container). Deterministic
    * stand-in for an audio corpus — like [[asBlobTable]], but the
    * container is genuine: [[audioMeta]] parses it with the platform
    * decoder, and the frame count is pure arithmetic on the text
    * length (len/2), so the end-to-end decode is DuckDB-checkable. */
  def asWavBlobTable(df: DataFrame, idCol: String, textCol: String,
                     sampleRateHz: Int = 8000): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id, wavBytes(text.getBytes("UTF-8"), sampleRateHz))
      })
      .toDF("id", "data")
  }

  /** A correct minimal RIFF/WAVE container (PCM s16le mono) around
    * `pcm` (truncated to an even byte count — 2 bytes per frame). */
  private[graft] def wavBytes(pcm: Array[Byte], sampleRateHz: Int): Array[Byte] = {
    val dataLen = pcm.length & ~1
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                     // PCM
      .putShort(1)                     // mono
      .putInt(sampleRateHz)
      .putInt(sampleRateHz * 2)        // byte rate = rate × blockAlign
      .putShort(2)                     // blockAlign = channels × 16/8
      .putShort(16)                    // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
      .put(pcm, 0, dataLen)
    out.array()
  }

  /** Feature extraction over blob partitions: the batch boundary a
    * real pipeline gives its decoder (amortizes codec init per
    * partition, not per row). */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: ImageIO's disk-backed stream cache
        // is pure overhead for in-memory byte arrays — disable once
        // per task, not per row
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, data) => decode(id, data) }
      }
  }

  /** Deterministic stand-in for a media resize: subsample the byte
    * stream to at most `w*h` bytes with a fixed stride. The contract
    * (bytes + target dims in, bytes + updated meta out) and the
    * per-partition batch boundary are the real thing; only the pixel
    * math is fake (no codecs in this environment). */
  def resizeStub(data: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, w * h)
    if (data.length <= target) data
    else {
      val stride = data.length.toDouble / target
      Array.tabulate(target)(i => data((i * stride).toInt))
    }
  }

  /** Resize every blob to `w`×`h`, rewriting the metadata struct.
    * One narrow mapPartitions stage: no shuffle, no driver hop. */
  def resized(blobs: DataFrame, w: Int, h: Int): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, d) => (id, resizeStub(d, w, h)) })
      .toDF("id", "data")
      .withColumn("meta", struct(lit("resized").as("format"),
        lit(w).as("width"), lit(h).as("height")))
  }

  /** Sample `n` evenly spaced frames per blob (the video frame-sample
    * shape): frame i is the byte span [i·sz, (i+1)·sz) with sz =
    * len/n, the last frame absorbing the remainder — so short blobs
    * yield n-1 empty frames plus the whole payload, never an error.
    * Each input row expands to its n frames in place (flatMap, one
    * narrow stage); at corpus scale the fan-out is bounded by n and
    * never shuffles. */
  def frameSample(blobs: DataFrame, n: Int): Dataset[MediaFrame] = {
    require(n >= 1, "frameSample needs n >= 1")
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("data")).as[(Long, Array[Byte])]
      .flatMap { case (id, d) =>
        val sz = d.length / n
        (0 until n).map { i =>
          val from = i * sz
          val until = if (i == n - 1) d.length else (i + 1) * sz
          MediaFrame(id, i.toLong, java.util.Arrays.copyOfRange(d, from, until))
        }
      }
  }
}
