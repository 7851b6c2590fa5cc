package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Deterministic hash-split contract: complete, disjoint, stable
  * across runs and partitionings, fractions approximately honored.
  * Exact cross-engine agreement is hash-checked by the driver gate
  * (`q_hash_split` vs its DuckDB oracle). */
class HashSplitSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private def docs = Tables.documents(spark, SparkSuite.sf0001)

  test("every row gets exactly one split and fractions are approximately honored") {
    val n = docs.count().toDouble
    val counts = TextAnalysis.hashSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts.values.sum.toDouble === n) // complete and disjoint
    // md5 uniformity at 500 rows: generous ±0.08 absolute tolerance
    assert(math.abs(counts("train") / n - 0.8) < 0.08, s"train=${counts("train")}")
    assert(math.abs(counts("val") / n - 0.1) < 0.08, s"val=${counts("val")}")
    assert(math.abs(counts("test") / n - 0.1) < 0.08, s"test=${counts("test")}")
  }

  test("sourceMix: deterministic, rate-monotone (nested samples), boundary rates exact") {
    val n = docs.count()
    def kept(rate: Double): Set[Long] =
      TextAnalysis.sourceMix(docs, "doc_id", "source",
        Map.empty, defaultRate = rate)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept(1.0).size === n, "rate 1.0 keeps everything")
    assert(kept(0.0).isEmpty, "rate 0.0 keeps nothing")
    val half = kept(0.5)
    assert(kept(0.25).subsetOf(half), "raising the rate only adds rows")
    assert(half.subsetOf(kept(0.75)))
    // approximately the asked fraction, and stable across calls
    assert(math.abs(half.size.toDouble / n - 0.5) < 0.08)
    assert(half === kept(0.5))
    // per-source rates apply independently of other sources
    val mixed = TextAnalysis.sourceMix(docs, "doc_id", "source",
      Map("src0" -> 0.0), defaultRate = 1.0)
    assert(mixed.filter(org.apache.spark.sql.functions.col("source") === "src0").count() === 0)
    assert(mixed.count() === docs.filter(
      org.apache.spark.sql.functions.col("source") =!= "src0").count())
  }

  test("packSequences: contiguous token stream per shard, bins sized to the budget") {
    val ctx = 64
    val out = TextAnalysis.packSequences(docs, "doc_id", "text",
      ctxTokens = ctx, shards = 4).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("bin"), r.getAs[Long]("tok_start")))
    assert(out.length === docs.count())
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      // first doc of each shard starts at 0; offsets strictly ordered
      assert(sorted.head._4 === 0L)
      assert(sorted.map(_._4) === sorted.map(_._4).sorted)
      // bin is exactly the window containing the doc's first token
      sorted.foreach { case (_, _, bin, start) => assert(bin === start / ctx) }
    }
  }

  test("assignment is stable across runs and independent of partitioning") {
    def assignment(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      TextAnalysis.hashSplit(df, "doc_id").select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a = assignment(docs)
    val b = assignment(docs.repartition(7))
    assert(a === b)
  }

  test("single split takes everything; bad fractions rejected") {
    val only = TextAnalysis.hashSplit(docs, "doc_id", Seq("all" -> 1.0))
      .select("split").distinct().collect().map(_.getString(0)).toSeq
    assert(only === Seq("all"))
    intercept[IllegalArgumentException](
      TextAnalysis.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
  }
}
