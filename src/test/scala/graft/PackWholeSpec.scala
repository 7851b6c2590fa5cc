package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.lit
import graft.operators.TextAnalysis

/** [[TextAnalysis.packSequencesWhole]] — next-fit whole-doc packing:
  * hand-computed fold, never-split invariant, oversize isolation,
  * per-shard state reset, repartition invariance.
  */
class PackWholeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def doc(n: Int): String = (1 to n).map(_ => "w").mkString(" ")

  test("hand-computed next-fit fold with an oversize doc") {
    val spark2 = spark
    import spark2.implicits._
    // one shard, ctx 10, counts 4,5,3,10,2,12
    val docs = Seq(0L -> doc(4), 1L -> doc(5), 2L -> doc(3), 3L -> doc(10),
      4L -> doc(2), 5L -> doc(12)).toDF("doc_id", "text")
    val got = TextAnalysis.packSequencesWhole(docs, "doc_id", "text",
      ctxTokens = 10, shards = 1)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("bin"), r.getAs[Long]("tok_start"),
          r.getAs[Long]("n_tokens")))).toMap
    assert(got === Map(
      0L -> ((0L, 0L, 4L)),   // opens bin 0
      1L -> ((0L, 4L, 5L)),   // 4+5 = 9 <= 10: same bin
      2L -> ((1L, 0L, 3L)),   // 9+3 overflows: bin 1
      3L -> ((2L, 0L, 10L)),  // exactly ctx: alone in bin 2
      4L -> ((3L, 0L, 2L)),   // bin 2 is full: bin 3
      5L -> ((4L, 0L, 12L)))) // oversize: isolated in bin 4
  }

  test("docs never split and every doc is packed exactly once") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 120L).map(i => i -> doc(3 + (i % 17).toInt))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.packSequencesWhole(docs, "doc_id", "text",
      ctxTokens = 40, shards = 4).collect()
    assert(rows.length === 120)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length === 120)
    rows.foreach { r =>
      val (s, off, n) = (r.getAs[Long]("shard"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("n_tokens"))
      assert(s === r.getAs[Long]("doc_id") % 4)
      assert(off + n <= 40, s"doc ${r.getAs[Long]("doc_id")} split")
    }
  }

  test("per-shard state resets when one task holds several shards") {
    val spark2 = spark
    import spark2.implicits._
    // 64 shards over a 32-partition exchange: tasks hold >1 shard
    val docs = (0L until 256L).map(i => i -> doc(7)).toDF("doc_id", "text")
    val rows = TextAnalysis.packSequencesWhole(docs, "doc_id", "text",
      ctxTokens = 20, shards = 64).collect()
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.size === 64)
    byShard.foreach { case (_, rs) =>
      val first = rs.minBy(_.getAs[Long]("doc_id"))
      assert(first.getAs[Long]("bin") === 0L)
      assert(first.getAs[Long]("tok_start") === 0L)
    }
  }

  test("tokensCol override drives the fold; repartition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 30L).map(i => i -> "ignored text").toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.packSequencesWhole(d, "doc_id", "text", ctxTokens = 12,
        shards = 2, tokensCol = Some(lit(5)))
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bin"),
          r.getAs[Long]("tok_start"))).sortBy(_._1).toSeq
    val a = run(docs)
    assert(a === run(docs.repartition(11)))
    // n=5, ctx=12: exactly two docs per bin, offsets 0 and 5
    a.groupBy { case (id, _, _) => (id % 2, a.find(_._1 == id).get._2) }
      .foreach { case (_, g) =>
        assert(g.size <= 2)
        assert(g.map(_._3).toSet.subsetOf(Set(0L, 5L)))
      }
  }
}
