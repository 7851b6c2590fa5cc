package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketch

/** [[Sketch.heavyHitters]] — Misra–Gries two-pass exact heavy
  * hitters: output equality against the full groupBy reference (the
  * two-pass must be INVISIBLE in the result), the candidate-superset
  * guarantee at the minimum legal counter budget, threshold-boundary
  * inclusion, and input hygiene. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def hh(values: Seq[String], support: Double,
                 counters: Int = 0): Map[String, Long] = {
    val s = spark
    import s.implicits._
    Sketch.heavyHitters(values.toDF("v"), "v", support, counters)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
  }

  private def exact(values: Seq[String], support: Double): Map[String, Long] = {
    val n = values.size
    val thr = math.ceil(support * n)
    values.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
  }

  test("matches the exact groupBy answer on a skewed stream (zipf-ish, seeded)") {
    val rnd = new scala.util.Random(7)
    // rank r with weight ~ 1/r over 200 distinct values, 20k draws
    val vals = Seq.fill(20000) {
      val r = math.min(199, (math.exp(rnd.nextDouble() * math.log(200.0)) - 1).toInt)
      s"v$r"
    }
    for (s <- Seq(0.002, 0.01, 0.05))
      assert(hh(vals, s) === exact(vals, s), s"support=$s")
  }

  test("minimum legal counter budget still yields the exact answer (superset guarantee)") {
    // support 0.1 with counters = 10: c+1 = 11 >= 1/support — the
    // tightest budget the guarantee admits; MG may surface spurious
    // candidates, the recount must kill them all
    val vals = Seq.fill(600)("a") ++ Seq.fill(59)("b") ++
      (1 to 341).map(i => s"noise$i")
    assert(hh(vals, 0.1, counters = 10) === exact(vals, 0.1))
    assert(hh(vals, 0.1, counters = 10) === Map("a" -> 600L))
  }

  test("threshold is inclusive: a value at exactly ceil(support*N) survives") {
    // N = 100, support 0.2 -> threshold 20; 'edge' has exactly 20
    val vals = Seq.fill(20)("edge") ++ (1 to 80).map(i => s"u$i")
    assert(hh(vals, 0.2) === Map("edge" -> 20L))
  }

  test("nulls are excluded from both candidates and the total N") {
    val s = spark
    import s.implicits._
    // 8 non-null values: 'a'×6 over support 0.5 of N=8 (thr 4); the
    // 4 nulls must not inflate N to 12 (thr 6 would still pass) nor
    // appear as a value
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(2)(Some("b")) ++
      Seq.fill(4)(Option.empty[String])).toDF("v")
    val got = Sketch.heavyHitters(df, "v", 0.7)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("cnt")).toMap
    // thr = ceil(0.7*8) = 6 — 'a' passes only if N excluded nulls
    assert(got === Map("a" -> 6L))
  }

  test("counter budgets below the guarantee are rejected") {
    val s = spark
    import s.implicits._
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException] {
      Sketch.heavyHitters(df, "v", support = 0.01, counters = 50)
    }
  }
}
