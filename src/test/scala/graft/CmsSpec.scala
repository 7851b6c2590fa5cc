package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sketch

class CmsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def zipfStream = {
    val spark2 = spark
    import spark2.implicits._
    // value v appears ~ 2000/v times: a few heavy keys, a long tail
    (1 to 60).flatMap(v => Seq.fill(2000 / v)(s"w$v")).toDF("term")
  }

  test("count-min estimates are one-sided: est >= true count, never under") {
    val spark2 = spark
    import spark2.implicits._
    val df = zipfStream
    val truth = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = truth.keys.toSeq.toDF("term")
    // deliberately narrow sketch so collisions actually occur
    val est = Sketch.cmsFreq(df, "term", probes, width = 16, depth = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === truth.keySet)
    truth.foreach { case (t, c) =>
      assert(est(t) >= c, s"underestimate for $t: ${est(t)} < $c")
    }
  }

  test("a wide-enough sketch is exact; unseen probes estimate 0") {
    val spark2 = spark
    import spark2.implicits._
    val df = zipfStream
    val truth = df.groupBy("term").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = (truth.keys.toSeq :+ "never-seen").toDF("term")
    // 60 distinct keys in 2^14 buckets, depth 4: collision odds in
    // EVERY row are negligible; the min picks a collision-free row
    val est = Sketch.cmsFreq(df, "term", probes, width = 1 << 14, depth = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (t, c) => assert(est(t) === c) }
    assert(est("never-seen") === 0L)
  }

  test("counters merge by addition: sketch(a ++ b) == sketch(a) + sketch(b)") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1 to 500).map(i => s"w${i % 17}").toDF("term")
    val b = (1 to 700).map(i => s"w${i % 23}").toDF("term")
    def m(df: org.apache.spark.sql.DataFrame) =
      Sketch.cmsCounters(df, "term", width = 64, depth = 3)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = {
      val ma = m(a); val mb = m(b)
      (ma.keySet ++ mb.keySet).map(k =>
        k -> (ma.getOrElse(k, 0L) + mb.getOrElse(k, 0L))).toMap
    }
    assert(m(a.union(b)) === merged)
  }

  test("shuffle stays parameter-bounded: counter rows <= depth * width") {
    val counters = Sketch.cmsCounters(zipfStream, "term", width = 32, depth = 3)
    assert(counters.count() <= 3L * 32)
  }

  test("kmvOverlap: exact below k on disjoint, identical, and half-overlapping corpora; tolerant above k") {
    val spark2 = spark
    import spark2.implicits._
    def corpus(r: Range, p: String) = r.map(i => s"$p$i").toDF("v")
    // disjoint, both below k: intersection 0, jaccard 0
    val dis = Sketch.kmvOverlap(corpus(1 to 50, "a"), corpus(1 to 50, "b"), "v")
      .collect()(0)
    assert(dis.getAs[Long]("approx_a") === 50L)
    assert(dis.getAs[Long]("approx_union") === 100L)
    assert(dis.getAs[Long]("approx_intersection") === 0L)
    assert(dis.getAs[Double]("approx_jaccard") === 0.0)
    // identical: jaccard 1
    val same = Sketch.kmvOverlap(corpus(1 to 80, "x"), corpus(1 to 80, "x"), "v")
      .collect()(0)
    assert(same.getAs[Long]("approx_intersection") === 80L)
    assert(same.getAs[Double]("approx_jaccard") === 1.0)
    // half overlap: A = 1..100, B = 51..150 → inter 50, union 150
    val half = Sketch.kmvOverlap(corpus(1 to 100, "x"), corpus(51 to 150, "x"), "v")
      .collect()(0)
    assert(half.getAs[Long]("approx_intersection") === 50L)
    assert(math.abs(half.getAs[Double]("approx_jaccard") - 50.0 / 150.0) < 1e-5)
    // above k: estimates within the KMV tolerance band
    val big = Sketch.kmvOverlap(corpus(1 to 4000, "x"), corpus(2001 to 6000, "x"),
      "v", k = 512).collect()(0)
    assert(math.abs(big.getAs[Long]("approx_union") - 6000.0) / 6000.0 < 0.25)
    assert(big.getAs[Long]("approx_intersection") < 4000L)
  }

  test("grouped KMV: exact below k, within tolerance above, matches global on one group") {
    val spark2 = spark
    import spark2.implicits._
    // group a: 10 distinct values (< k) — estimator must be exact;
    // group b: 2000 distinct — estimate within the ~1/sqrt(k-2) band
    val df = ((1 to 10).map(i => ("a", s"v$i")) ++
      (1 to 2000).map(i => ("b", s"w$i"))).toDF("g", "v")
    val got = Sketch.kmvDistinctGrouped(df, "g", "v", k = 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") === 10L)
    assert(math.abs(got("b") - 2000.0) / 2000.0 < 0.25,
      s"group estimate ${got("b")} too far from 2000")
    // degenerate single group == the global estimator
    val globalEst = Sketch.kmvDistinct(df.filter(col("g") === "b"), "v",
      k = 256).collect()(0).getLong(0)
    assert(got("b") === globalEst)
  }
}
