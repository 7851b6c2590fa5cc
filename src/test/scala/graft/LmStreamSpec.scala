package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis
import graft.streaming.EventStream

/** Pins [[EventStream.lmScoreStream]] to its batch twin
  * [[TextAnalysis.lmPerplexity]] (the EventStream twin discipline):
  * per-doc scores — each computed within the micro-batch that carries
  * the doc; the stream retains NO per-doc state between batches —
  * must equal the batch scorer bit-for-bit on the n_tokens > 0
  * subset, with the model fit once in batch and riding the stream as
  * static join sides. Also
  * pins the mergeable count maintenance: merged daily deltas equal
  * the one-pass refit.
  */
class LmStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("stream scores equal batch lmPerplexity across two micro-batches") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 60L).map { i =>
      i -> (if (i % 3 == 0) "the quick brown fox jumps over the lazy dog"
            else s"doc $i mixes the quick words with tok$i noise")
    }.toDF("doc_id", "text")
    val ref = docs.filter(col("doc_id") <= 20L)
    val uni = TextAnalysis.lmUnigramCounts(ref, "text").persist()
    val bi = TextAnalysis.lmBigramCounts(ref, "text", minCount = 2L).persist()
    val expected = TextAnalysis.lmPerplexity(docs, "doc_id", "text", uni, bi)
      .filter(col("n_tokens") > 0).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
          r.getAs[Double]("ppl")))).toMap

    val dir = Files.createTempDirectory("graft-lm-stream").toString
    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(dir)
    val q = EventStream.lmScoreStream(spark, dir, uni, bi)
      .writeStream.outputMode("update").format("memory")
      .queryName("lm_stream_out").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("lm_stream_out").collect()
      assert(afterFirst.length === 30, "first batch scores its 30 docs")
      docs.filter(col("doc_id") % 2 === 1).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("lm_stream_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logp"),
            r.getAs[Double]("ppl")))).toMap
      assert(got.size === 60)
      assert(got === expected)
    } finally q.stop()
  }

  test("merged count deltas equal the one-pass refit, pruned after merge") {
    val spark2 = spark
    import spark2.implicits._
    val dayA = Seq(1L -> "a b a b c", 2L -> "b c d", 5L -> "q r")
      .toDF("doc_id", "text")
    val dayB = Seq(3L -> "a b c c", 4L -> "b c b c", 6L -> "q r")
      .toDF("doc_id", "text")
    val full = dayA.unionByName(dayB)
    def toMapU(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("tok") -> r.getAs[Long]("c")).toMap
    def toMapB(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
        r.getAs[Long]("c_ab")).toMap
    assert(toMapU(TextAnalysis.lmMergeUnigramCounts(
        TextAnalysis.lmUnigramCounts(dayA, "text"),
        TextAnalysis.lmUnigramCounts(dayB, "text")))
      === toMapU(TextAnalysis.lmUnigramCounts(full, "text")))
    // deltas fit UNPRUNED, threshold applied after the merged sum:
    // (q,r) is a singleton in each day (pre-pruned deltas would drop
    // it) but its merged count 2 makes the cut
    val merged = TextAnalysis.lmMergeBigramCounts(
      TextAnalysis.lmBigramCounts(dayA, "text", minCount = 1L),
      TextAnalysis.lmBigramCounts(dayB, "text", minCount = 1L),
      minCount = 2L)
    assert(toMapB(merged)
      === toMapB(TextAnalysis.lmBigramCounts(full, "text", minCount = 2L)))
    assert(toMapB(merged).contains(("q", "r")))
  }
}
