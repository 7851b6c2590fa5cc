package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Eval

/** Pins [[Eval.rocAuc]] to a plain-Scala midrank Mann–Whitney
  * reference (ties included) and [[Eval.calibrationBins]] to direct
  * per-bin arithmetic, plus the degenerate and boundary cases the
  * gate corpus can't stage. */
class EvalSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Textbook midrank AUC: average rank of positives, normalized. */
  private def refAuc(rows: Seq[(Double, Int)]): Option[Double] = {
    val np = rows.count(_._2 == 1)
    val nn = rows.size - np
    if (np == 0 || nn == 0) None
    else {
      val ranked = rows.sortBy(_._1).zipWithIndex
        .groupBy(_._1._1).values.flatMap { tied =>
          val mid = tied.map(_._2 + 1).sum.toDouble / tied.size
          tied.map { case ((_, l), _) => (l, mid) }
        }
      val sumPos = ranked.collect { case (1, r) => r }.sum
      Some((sumPos - np.toLong * (np + 1) / 2.0) / (np.toDouble * nn))
    }
  }

  private def auc(rows: Seq[(Double, Int)]): (Option[Double], Long, Long) = {
    import spark.implicits._
    val r = Eval.rocAuc(rows.toDF("score", "label"), "score", "label").first()
    (Option(r.getAs[java.lang.Double]("auc")).map(_.doubleValue),
      r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
  }

  test("rocAuc equals the midrank reference on seeded tied data; boundary cases exact") {
    val rnd = new scala.util.Random(7)
    // coarse score grid → plenty of ties, including cross-class ties
    val rows = Seq.fill(400)((rnd.nextInt(20) / 20.0,
      if (rnd.nextDouble() < 0.4) 1 else 0))
    val (got, np, nn) = auc(rows)
    val want = refAuc(rows).get
    assert(np === rows.count(_._2 == 1).toLong && np + nn === 400L)
    assert(got.isDefined &&
      math.abs(got.get - BigDecimal(want).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9,
      s"auc $got vs reference $want")
    // perfect separation / perfect inversion / all-tied coin flip
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))._1 === Some(1.0))
    assert(auc(Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)))._1 === Some(0.0))
    assert(auc(Seq((0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)))._1 === Some(0.5))
    // one-class inputs have no rankable pairs: auc NULL, counts honest
    assert(auc(Seq((0.3, 1), (0.7, 1))) === ((None, 2L, 0L)))
    assert(auc(Seq((0.3, 0), (0.7, 0))) === ((None, 0L, 2L)))
  }

  test("rocAuc distributed midrank: many distinct scores spanning range partitions, repeat-stable, == single-window form") {
    // the r22 large-input form folds per-range-partition running sums
    // plus an algebraic cross-partition prefix — forced here with
    // distributedMinBytes = 0 and pinned against BOTH the plain-Scala
    // reference and the small-input single-window form on a score set
    // with thousands of DISTINCT values (so the distinct-score frame
    // genuinely spans partitions); re-run to catch pid/boundary
    // instability between evaluations
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(5000)((rnd.nextDouble(),
      if (rnd.nextDouble() < 0.3) 1 else 0))
    val want = BigDecimal(refAuc(rows).get).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val df = rows.toDF("score", "label")
    val single = Eval.rocAuc(df, "score", "label",
      distributedMinBytes = Long.MaxValue).first()
    (1 to 3).foreach { i =>
      val r = Eval.rocAuc(df, "score", "label",
        distributedMinBytes = 0L).first()
      val got = Option(r.getAs[java.lang.Double]("auc")).map(_.doubleValue)
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") === 5000L)
      assert(got.isDefined && math.abs(got.get - want) < 1e-9,
        s"run $i: auc $got vs reference $want")
      assert(got.get === single.getAs[java.lang.Double]("auc").doubleValue,
        "distributed and single-window forms must be bit-identical")
    }
    // degenerate inputs through the distributed path too
    def aucD(rs: Seq[(Double, Int)]) = {
      val r = Eval.rocAuc(rs.toDF("score", "label"), "score", "label",
        distributedMinBytes = 0L).first()
      (Option(r.getAs[java.lang.Double]("auc")).map(_.doubleValue),
        r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
    }
    assert(aucD(Seq((0.3, 1), (0.7, 1))) === ((None, 2L, 0L)))
    assert(aucD(Seq.empty[(Double, Int)]) === ((None, 0L, 0L)))
  }

  test("calibrationBins: bin edges, top-bin clamp, exact means, determinism") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0.00, 0), (0.05, 0), (0.09, 1),        // bin 0
      (0.95, 1), (1.00, 1),                   // bin 9 (1.0 clamps in)
      (0.50, 1), (0.55, 0))                   // bin 5
    val out = Eval.calibrationBins(rows.toDF("score", "label"),
        "score", "label", bins = 10)
      .collect().map(r => r.getAs[Int]("bin") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"),
          r.getAs[Double]("mean_score"), r.getAs[Double]("pos_rate")))
      .toMap
    assert(out.keySet === Set(0, 5, 9))
    assert(out(0) === ((3L, 1L, 0.046667, 0.333333)))
    assert(out(9) === ((2L, 2L, 0.975, 1.0)))
    assert(out(5) === ((2L, 1L, 0.525, 0.5)))
    // deterministic under repartition (fixed-point means)
    val a = Eval.calibrationBins(rows.toDF("score", "label")
        .repartition(5), "score", "label").collect().map(_.toString).sorted
    val b = Eval.calibrationBins(rows.toDF("score", "label")
        .repartition(2), "score", "label").collect().map(_.toString).sorted
    assert(a === b)
    intercept[IllegalArgumentException](
      Eval.calibrationBins(rows.toDF("score", "label"), "score", "label", 1))
    // null scores/labels excluded, not NPE'd
    val withNull = rows.toDF("score", "label")
      .unionByName(Seq((Option.empty[Double], Option.empty[Int]))
        .toDF("score", "label"))
    assert(Eval.calibrationBins(withNull, "score", "label")
      .agg(org.apache.spark.sql.functions.sum(col("n"))).first().getLong(0)
      === 7L)
  }
}
