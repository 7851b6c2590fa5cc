package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.bpeDecode]] — tokenizer round-trip certification:
  * decode(encode(corpus)) equals the normalized corpus, including
  * whitespace-noise and wordless edges.
  */
class BpeDecodeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("round-trip reproduces the normalized corpus, ok all-true") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> "low lower lowest newer new",
      2L -> "wider  wide   widest", // multi-space: normalizes to single
      3L -> "low new low",
      4L -> "").toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", merges = 6)
    val got = TextAnalysis.bpeDecode(docs, "doc_id", "text", merges)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("decoded"), r.getAs[Boolean]("ok")))).toMap
    assert(got(1L) === (("low lower lowest newer new", true)))
    assert(got(2L) === (("wider wide widest", true)))
    assert(got(3L) === (("low new low", true)))
    assert(got(4L) === (("", true))) // wordless: empty decode == empty norm
  }

  test("round-trip holds with a minimal one-merge vocab") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(1L -> "ab ba aab").toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", merges = 1)
    val got = TextAnalysis.bpeDecode(docs, "doc_id", "text", merges).collect()
    assert(got.forall(_.getAs[Boolean]("ok")))
  }

  test("decode is repartition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 30L).map(i => i -> s"tok${i % 5} low new shared word")
      .toDF("doc_id", "text")
    val merges = TextAnalysis.bpeMerges(docs, "text", merges = 4)
    def run(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.bpeDecode(d, "doc_id", "text", merges).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("decoded"),
          r.getAs[Boolean]("ok"))).sortBy(_._1).toSeq
    val a = run(docs)
    assert(a.forall(_._3))
    assert(a === run(docs.repartition(7)))
  }
}
