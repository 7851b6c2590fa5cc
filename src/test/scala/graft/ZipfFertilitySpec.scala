package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.zipfFit]] (OLS over the log-log term ranking) and
  * [[TextAnalysis.bpeFertility]] (pieces per word by source) against
  * plain-Scala references.
  */
class ZipfFertilitySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The operator's exact arithmetic on (rank, cnt) pairs. */
  private def refFit(counts: Seq[Long]): (Double, Double) = {
    val xy = counts.zipWithIndex.map { case (c, i) =>
      (Math.round(Math.log((i + 1).toDouble) * 1e6),
       Math.round(Math.log(c.toDouble) * 1e6))
    }
    val k = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sy = xy.map(_._2).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val num = (BigInt(k) * BigInt(sxy) - BigInt(sx) * BigInt(sy)).toDouble
    val den = (BigInt(k) * BigInt(sxx) - BigInt(sx) * BigInt(sx)).toDouble
    val slope = num / den
    (r6(slope), r6((sy.toDouble - slope * sx.toDouble) / k.toDouble / 1e6))
  }

  test("zipfFit matches the fixed-point OLS reference; power law slopes ~ -1") {
    val spark2 = spark
    import spark2.implicits._
    // token t{r} appears floor(600/r) times: cnt ∝ 1/rank; the zero-
    // padded names keep tied counts (t29/t30, both 20) in rank order
    val counts = (1 to 30).map(r => 600L / r)
    val docs = (1 to 30).map(r =>
      (r.toLong, Seq.fill((600 / r).toInt)(f"t$r%02d").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.zipfFit(docs, "text", topK = 30).collect()(0)
    val (eSlope, eIntercept) = refFit(counts)
    assert(got.getAs[Long]("n_terms") === 30L)
    assert(got.getAs[Double]("slope") === eSlope)
    assert(got.getAs[Double]("intercept") === eIntercept)
    assert(got.getAs[Double]("slope") > -1.15 && got.getAs[Double]("slope") < -0.85)
  }

  test("zipfFit rank ties break lexicographically (deterministic)") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(1L -> "b a c b a c").toDF("doc_id", "text")
    val a = TextAnalysis.zipfFit(docs, "text", topK = 3).collect()(0)
    val b = TextAnalysis.zipfFit(docs.repartition(5), "text", topK = 3)
      .collect()(0)
    assert(a === b)
  }

  test("bpeFertility matches the hand-computed dictionary") {
    val spark2 = spark
    import spark2.implicits._
    // dictionary {aa: 2, bb: 1}; 1 merge learns (a,a) → aa whole,
    // bb splits into 2 pieces
    val docs = Seq((1L, "aa bb aa", "s1"), (2L, "aa", "s2"))
      .toDF("doc_id", "text", "source")
    val merges = TextAnalysis.bpeMerges(docs, "text", merges = 1)
    val got = TextAnalysis.bpeFertility(docs, "text", "source", merges)
      .collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_words"), r.getAs[Long]("n_pieces"),
          r.getAs[Double]("fertility"), r.getAs[Double]("pct_unsplit"))))
      .toMap
    assert(got("s1") === ((3L, 4L, r6(4.0 / 3.0), r6(2.0 / 3.0))))
    assert(got("s2") === ((1L, 1L, 1.0, 1.0)))
  }
}
