package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Train→eval contamination: planted-overlap semantics and the
  * hashed-vs-string gram-path equivalence. */
class ContaminationSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("planted overlap is measured exactly; clean docs score zero") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val eval = Seq(
      // verbatim copy: every 3-gram contaminated
      (101L, "the quick brown fox jumps over the lazy dog"),
      // partial: shares exactly the window "quick brown fox jumps"
      (102L, "she saw a quick brown fox jumps nearby today"),
      // disjoint vocabulary
      (103L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val out = TextAnalysis.contamination(eval, train, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("hits")))).toMap
    assert(out(101L)._1 === out(101L)._2, "verbatim copy must be 100% contaminated")
    // "quick brown fox jumps" contributes 3-grams "quick brown fox"
    // and "brown fox jumps"
    assert(out(102L)._2 === 2)
    assert(out(103L)._2 === 0)
  }

  test("hashed gram path equals the string gram path doc-for-doc") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val eval = docs.filter(col("doc_id") % 2 === 1)
    val train = docs.filter(col("doc_id") % 2 === 0)
    def collect(hashed: Boolean): Map[Long, (Long, Long)] =
      TextAnalysis.contamination(eval, train, "doc_id", "text", hashed = hashed)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_grams"), r.getAs[Long]("hits")))).toMap
    val h = collect(hashed = true)
    val st = collect(hashed = false)
    assert(h === st, "mod-P gram hashing must not change counts at this scale")
    assert(st.nonEmpty)
  }
}
