package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Similarity, TextAnalysis}

/** Physical-plan pins for the properties the 100 TB path depends on:
  * filters and projections reaching the parquet scan, the bounded hot
  * side of skew-split joins actually broadcasting, and the LSH pair
  * pipeline never degenerating into a cartesian product. These are the
  * invariants a refactor could silently lose while every value-level
  * test stays green. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter and projection push down into the parquet scan") {
    val df = Tables.lineitem(spark, SparkSuite.sf0001)
      .filter(col("l_returnflag") === "A")
      .select("l_orderkey", "l_quantity")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("EqualTo(l_returnflag,A)"),
      s"filter not pushed to scan:\n$p")
    // column pruning: the scan must not read columns the query never uses
    assert(!p.contains("l_extendedprice") && !p.contains("l_shipdate"),
      s"scan reads unprojected columns:\n$p")
  }

  test("tfidf frequency-split: the bounded hot-term side broadcasts") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val p = plan(TextAnalysis.tfidfTop(docs, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"),
      s"hot-term join is not a broadcast join:\n$p")
  }

  test("bm25 keeps the frequency-split broadcast and adds no cartesian") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val p = plan(TextAnalysis.bm25Top(docs, "doc_id", "text"))
    assert(p.contains("BroadcastHashJoin"),
      s"hot-term join is not a broadcast join:\n$p")
    // the 1-row totals scalar must ride a broadcast nested loop, never
    // a flat cartesian of the scored rows
    assert(!p.contains("CartesianProduct"),
      s"totals scalar degenerated to a cartesian product:\n$p")
  }

  test("chunkTokens and projectDense are single-stage map-side plans") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val pc = plan(TextAnalysis.chunkTokens(docs, "doc_id", "text", 32, 24))
    assert(!pc.contains("Exchange"), s"chunking shuffles:\n$pc")
    val emb = Tables.embeddings(spark, SparkSuite.sf0001)
    val pp = plan(Similarity.projectDense(emb, "vec_id", "embedding",
      dim = 64, outDim = 8))
    assert(!pp.contains("Exchange"), s"dense projection shuffles:\n$pp")
  }

  test("IVF probe list broadcasts; scan side never shuffles on cluster") {
    val emb = Tables.embeddings(spark, SparkSuite.sf0001)
    val q = Similarity.seededUnitVector(64, 11L)
    val p = plan(Similarity.ivfTopK(emb, "vec_id", "embedding", "label", q, 10))
    assert(p.contains("BroadcastHashJoin"),
      s"probed-centroid join is not broadcast:\n$p")
  }

  test("embedding near-dup plan has no cartesian product") {
    val emb = Tables.embeddings(spark, SparkSuite.sf0001)
    val p = plan(Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.40))
    assert(!p.contains("CartesianProduct"),
      s"LSH pair pipeline degenerated to a cartesian product:\n$p")
    spark.catalog.clearCache()
  }

  test("stripBoilerplate anti-join broadcasts the bounded boilerplate list") {
    // the 100 TB argument rests on the df>cap list being tiny ⇒ the
    // segs ⋈ boiler LeftAnti must be a BROADCAST hash join, never a
    // shuffled anti-join on the full segment table. The build side is
    // a filtered aggregate whose static size estimate is unknown, so
    // the broadcast decision is AQE's — execute first, then pin the
    // FINAL adaptive plan.
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val df = TextAnalysis.stripBoilerplate(docs, "doc_id", "text",
      sep = " ", maxDocFreq = 300L)
    df.collect()
    val p = plan(df)
    assert(p.contains("isFinalPlan=true"), s"plan not finalized:\n$p")
    assert(p.linesIterator.exists(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti")),
      s"boilerplate anti-join is not a broadcast LeftAnti:\n$p")
  }
}
