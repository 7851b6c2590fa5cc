package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataSelection
import graft.streaming.EventStream

/** Pins [[EventStream.dsirScoreStream]] to its batch twin
  * [[DataSelection.dsirLogWeights]]: per-doc scores — each computed
  * within the micro-batch that carries the doc (the stream retains
  * NO per-doc state between batches) — equal the batch weights
  * bit-for-bit on the n_tokens > 0 subset, with the ratio table fit
  * once in batch and riding the stream as a static broadcast side.
  */
class DsirStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("stream scores equal batch dsirLogWeights across two micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 50L).map { i =>
      i -> (if (i % 2 == 0) "alpha beta gamma common words"
            else s"omega psi tok$i common noise")
    }.toDF("doc_id", "text")
    val target = Seq(100L -> "alpha beta alpha gamma common")
      .toDF("doc_id", "text")
    val buckets = 256
    // the model artifact: fit once against the FULL standing corpus
    val ratios = DataSelection.dsirRatioTable(
      target, "text", docs, "text", buckets).persist()
    val expected = DataSelection.dsirLogWeights(docs, "doc_id", "text",
      target, "text", buckets)
      .filter(col("n_tokens") > 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_w")))).toMap

    val dir = Files.createTempDirectory("graft-dsir-stream").toString
    docs.filter(col("doc_id") <= 25L).write.mode("append").parquet(dir)
    val q = EventStream.dsirScoreStream(spark, dir, ratios, buckets)
      .writeStream.outputMode("update").format("memory")
      .queryName("dsir_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dsir_stream_out").count() === 25)
      docs.filter(col("doc_id") > 25L).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("dsir_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_w")))).toMap
      assert(got.size === 50)
      assert(got === expected)
    } finally q.stop()
  }
}
