package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Cross-doc boilerplate removal on its production separator ('\n'):
  * planted repeated lines must vanish, unique lines must survive in
  * their original order, and a doc that was ALL boilerplate must come
  * back as '' (not disappear). The corpus-level query q_boilerplate
  * hash-checks the same operator against DuckDB on the space-separated
  * synthetic corpus. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("repeated lines stripped, unique lines kept in order, empty docs retained") {
    import spark.implicits._
    val banner = "subscribe to our newsletter"
    val cookie = "this site uses cookies"
    val docs = Seq(
      (0L, s"$banner\nalpha one\n$cookie\nalpha two"),
      (1L, s"beta one\n$banner\nbeta two\n$cookie"),
      (2L, s"$banner\ngamma only\n$cookie"),
      (3L, s"$banner\n$cookie"),            // all boilerplate -> ''
      (4L, s"delta one\ndelta two"),        // no boilerplate at all
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text",
        sep = "\n", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(
      0L -> "alpha one\nalpha two",
      1L -> "beta one\nbeta two",
      2L -> "gamma only",
      3L -> "",
      4L -> "delta one\ndelta two"))
  }

  test("non-text columns ride through untouched, schema order preserved") {
    import spark.implicits._
    val docs = Seq(
      (0L, "dup\nkeep a", "web", 0.5),
      (1L, "dup\nkeep b", "books", 0.9),
      (2L, "dup\nkeep c", "web", 0.1),
    ).toDF("doc_id", "text", "source", "score")
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text",
      sep = "\n", maxDocFreq = 2)
    assert(out.columns.toSeq === Seq("doc_id", "text", "source", "score"))
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[String]("text"), r.getAs[String]("source"), r.getAs[Double]("score"))).toMap
    assert(rows(0L) === (("keep a", "web", 0.5)))
    assert(rows(1L) === (("keep b", "books", 0.9)))
    assert(rows(2L) === (("keep c", "web", 0.1)))
  }

  test("threshold is by distinct docs, not occurrences") {
    import spark.implicits._
    // "spam" appears 4 times but only in 2 docs: at maxDocFreq=2 it
    // must survive (df == cap is not boilerplate)
    val docs = Seq(
      (0L, "spam\nspam\nkeep a"),
      (1L, "spam\nspam\nkeep b"),
      (2L, "keep c"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplate(docs, "doc_id", "text",
        sep = "\n", maxDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(0L) === "spam\nspam\nkeep a")
    assert(out(1L) === "spam\nspam\nkeep b")
    assert(out(2L) === "keep c")
  }
}
