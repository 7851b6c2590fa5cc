package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataSelection
import graft.streaming.EventStream

/** Pins [[EventStream.clfScoreStream]] to its batch twin
  * [[DataSelection.logregScore]]: per-doc classifier scores — each
  * computed within the micro-batch that carries the doc, the model
  * fit once in batch and riding the stream as a static broadcast
  * side, the bias weight folded at emission — equal the batch scorer
  * bit-for-bit on the n_tokens > 0 subset.
  */
class ClfStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("stream scores equal batch logregScore across two micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 50L).map { i =>
      val y = (i % 2).toInt
      val text =
        if (y == 1) s"clean prose alpha beta word$i"
        else s"spam junk zork noise$i"
      (i, text, y)
    }.toDF("doc_id", "text", "y")
    val buckets = 64
    val w = DataSelection.logregFit(docs, "doc_id", "text", "y",
      buckets = buckets, rounds = 2, lr = 1.0).persist()
    val expected = DataSelection.logregScore(docs, "doc_id", "text", w,
        buckets)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap

    val dir = Files.createTempDirectory("graft-clf-stream").toString
    docs.filter(col("doc_id") <= 25L).select("doc_id", "text")
      .write.mode("append").parquet(dir)
    val q = EventStream.clfScoreStream(spark, dir, w, buckets)
      .writeStream.outputMode("update").format("memory")
      .queryName("clf_stream_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("clf_stream_out").count() === 25)
      docs.filter(col("doc_id") > 25L).select("doc_id", "text")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("clf_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
      assert(got.size === 50)
      assert(got === expected)
    } finally q.stop()
  }

  test("tokenless docs are invisible to the stream; batch scores them bias-only") {
    val spark2 = spark
    import spark2.implicits._
    val train = Seq((1L, "alpha beta", 1), (2L, "zork junk", 0))
      .toDF("doc_id", "text", "y")
    val w = DataSelection.logregFit(train, "doc_id", "text", "y",
      buckets = 32, rounds = 2, lr = 1.0).persist()
    val feed = Seq((10L, "alpha beta"), (11L, ""), (12L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-clf-stream2").toString
    feed.write.mode("append").parquet(dir)
    val q = EventStream.clfScoreStream(spark, dir, w, 32)
      .writeStream.outputMode("update").format("memory")
      .queryName("clf_stream_out2").start()
    try {
      q.processAllAvailable()
      val got = spark.table("clf_stream_out2").collect()
        .map(r => r.getAs[Long]("doc_id")).toSet
      assert(got === Set(10L)) // 11/12 have no tokens: stream never sees them
    } finally q.stop()
    val batch = DataSelection.logregScore(feed, "doc_id", "text", w, 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(batch.keySet === Set(10L, 11L, 12L)) // batch emits all, bias-only
    assert(batch(11L) === batch(12L))
  }
}
