package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.CorpusDiff

class CorpusDiffSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("diff covers all four statuses and every id exactly once") {
    val spark2 = spark
    import spark2.implicits._
    val oldV = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("doc_id", "text")
    val newV = Seq((2L, "b"), (3L, "CHANGED"), (5L, "e"))
      .toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val counts = CorpusDiff.diffCounts(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("removed" -> 2L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
  }

  test("null text is a value ('' hash), not an absence") {
    val spark2 = spark
    import spark2.implicits._
    val oldV = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val newV = Seq((1L, null.asInstanceOf[String]),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CorpusDiff.diff(oldV, newV, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: text -> null = changed; doc 2: null -> null = unchanged
    assert(got === Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("self-diff is all-unchanged on the corpus table") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val statuses = CorpusDiff.diff(docs, docs, "doc_id", "text")
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses === Set("unchanged"))
  }
}
