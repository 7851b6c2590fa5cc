package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata carried alongside an opaque media blob. */
case class MediaMeta(format: String, width: Int, height: Int)

/** One media row: opaque bytes + typed metadata. */
case class MediaBlob(id: Long, data: Array[Byte], meta: MediaMeta)

/** Deterministic features extracted from one blob. */
case class MediaFeatures(id: Long, n_bytes: Long, checksum: Long,
                         head_histogram: Array[Int])

/** One sampled frame of a blob (video frame-sample shape). */
case class MediaFrame(id: Long, frame_idx: Long, frame: Array[Byte])

/** Multimodal (image/audio/video) column plumbing: blobs are opaque
  * `binary` columns with a typed metadata struct; decode /
  * feature-extract runs batch-wise over partitions.
  *
  * The actual media decode is STUBBED — codec libraries are not in
  * this environment — behind [[decodeStub]], a deterministic fake
  * with the same shape a real decoder would have (bytes in, features
  * out). Everything around it is real and scale-true: the schema, the
  * binaryFile source, the mapPartitions batch boundary (one fused
  * narrow stage, no shuffle, no driver involvement), and the typed
  * Dataset output.
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

  /** ??? in spirit: the real decoder (JPEG/PNG/audio frames) is not
    * available here. This deterministic fake has the decoder's
    * contract — Array[Byte] => features — so swapping in a real codec
    * changes only this function. */
  def decodeStub(id: Long, data: Array[Byte]): MediaFeatures = {
    var checksum = 0L
    val hist = new Array[Int](16)
    var i = 0
    while (i < data.length) {
      checksum = checksum * 31 + (data(i) & 0xff)
      if (i < 256) hist((data(i) & 0xff) % 16) += 1
      i += 1
    }
    MediaFeatures(id, data.length.toLong, checksum, hist)
  }

  /** Feature extraction over blob partitions: the batch boundary a
    * real pipeline gives its decoder (amortizes codec init per
    * partition, not per row). */
  def extractFeatures(blobs: DataFrame): Dataset[MediaFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id"), col("data")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" would happen here
        it.map { case (id, data) => decodeStub(id, data) }
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
