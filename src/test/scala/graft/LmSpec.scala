package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.operators.TextAnalysis

/** [[TextAnalysis.lmPerplexity]] (Stupid-Backoff bigram LM) against a
  * plain-Scala reference: hand-built counts, every backoff branch,
  * fixed-point determinism.
  */
class LmSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** The operator's exact arithmetic in plain Scala: per-token
    * contribution rounded to a 1e-9 long, doc sum, round-6 read-out. */
  private def refScore(tokens: Seq[Double]): (Double, Double) = {
    val s = tokens.map(p => Math.round(Math.log(p) * 1e9)).sum
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (r6((s.toDouble / 1e9) / tokens.size),
     r6(Math.exp((s.toDouble / -1e9) / tokens.size)))
  }

  private def fit(ref: DataFrame, minCount: Long = 1L) =
    (TextAnalysis.lmUnigramCounts(ref, "text"),
     TextAnalysis.lmBigramCounts(ref, "text", minCount))

  private def scoreOne(docs: DataFrame, ref: DataFrame,
                       minCount: Long = 1L): Map[Long, (Long, Any, Any)] = {
    val (uni, bi) = fit(ref, minCount)
    TextAnalysis.lmPerplexity(docs, "doc_id", "text", uni, bi)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.get(r.fieldIndex("avg_logp")),
          r.get(r.fieldIndex("ppl")))))
      .toMap
  }

  test("every backoff branch matches the hand-computed reference") {
    val spark2 = spark
    import spark2.implicits._
    // ref counts: a=2, b=2, c=1 (N=5); bigrams (a,b)=2, (b,a)=1, (b,c)=1
    val ref = Seq(1L -> "a b a b c").toDF("doc_id", "text")
    val docs = Seq(
      10L -> "a b c d", // first-seen, bigram, bigram, double-backoff OOV
      11L -> "z",       // first-token OOV floor
      12L -> "c z b"    // first-seen, backoff-to-OOV, backoff-to-seen
    ).toDF("doc_id", "text")
    val got = scoreOne(docs, ref)
    val a2 = 0.4 * 0.4
    val exp10 = refScore(Seq(2.0 / 5, 2.0 / 2, 1.0 / 2, a2 / 5))
    val exp11 = refScore(Seq(0.4 / 5))
    val exp12 = refScore(Seq(1.0 / 5, a2 / 5, 0.4 * 2.0 / 5))
    assert(got(10L) === ((4L, exp10._1, exp10._2)))
    assert(got(11L) === ((1L, exp11._1, exp11._2)))
    assert(got(12L) === ((3L, exp12._1, exp12._2)))
  }

  test("minCount prunes bigrams into the backoff path") {
    val spark2 = spark
    import spark2.implicits._
    val ref = Seq(1L -> "a b a b c").toDF("doc_id", "text")
    val docs = Seq(10L -> "b c").toDF("doc_id", "text")
    // minCount=2 drops (b,c); "c" after "b" backs off to 0.4·c(c)/N
    val got = scoreOne(docs, ref, minCount = 2L)
    val exp = refScore(Seq(2.0 / 5, 0.4 * 1.0 / 5))
    assert(got(10L) === ((2L, exp._1, exp._2)))
    // minCount=1 keeps it: the seen-bigram ratio instead
    val got1 = scoreOne(docs, ref, minCount = 1L)
    val exp1 = refScore(Seq(2.0 / 5, 1.0 / 2))
    assert(got1(10L) === ((2L, exp1._1, exp1._2)))
  }

  test("empty and null docs keep n_tokens 0 and null scores") {
    val spark2 = spark
    import spark2.implicits._
    val ref = Seq(1L -> "a b").toDF("doc_id", "text")
    val docs = Seq((20L, ""), (21L, null.asInstanceOf[String]),
      (22L, "  ")).toDF("doc_id", "text")
    val got = scoreOne(docs, ref)
    Seq(20L, 21L, 22L).foreach { id =>
      assert(got(id)._1 === 0L)
      assert(got(id)._2 === null)
      assert(got(id)._3 === null)
    }
  }

  test("in-distribution text scores lower perplexity than shuffled vocabulary") {
    val spark2 = spark
    import spark2.implicits._
    val ref = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox runs over the lazy cat").toDF("doc_id", "text")
    val docs = Seq(
      10L -> "the quick brown fox jumps over the lazy cat",
      11L -> "cat the over dog quick lazy fox brown the").toDF("doc_id", "text")
    val got = scoreOne(docs, ref)
    val ppl = got.map { case (k, v) => k -> v._3.asInstanceOf[Double] }
    assert(ppl(10L) < ppl(11L))
  }

  test("scores are invariant under repartitioning") {
    val spark2 = spark
    import spark2.implicits._
    val ref = Seq(1L -> "a b a b c", 2L -> "b c a").toDF("doc_id", "text")
    val docs = (1L to 40L).map(i =>
      i -> s"a b ${if (i % 2 == 0) "c" else "z"} b a").toDF("doc_id", "text")
    val base = scoreOne(docs, ref)
    val shuffled = scoreOne(docs.repartition(7), ref.repartition(3))
    assert(base === shuffled)
  }
}
