package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics

class EventAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def ev(rows: (Long, Long, String, String)*) = {
    val spark2 = spark
    import spark2.implicits._
    rows.toSeq.toDF("event_id", "t_s", "user_id", "event_type")
      .withColumn("ts", timestamp_seconds(col("t_s")))
      .withColumn("user_id", col("user_id").cast("long"))
  }

  test("interArrivalHistogram: bit-length buckets, first events excluded") {
    // user 7: events at 0,0,1,3,6,10,1034 s → gaps 0,1,2,3,4,1024
    //   buckets: 0, 1, 2, 2, 3, 11
    val df = ev((1, 0, "7", "x"), (2, 0, "7", "x"), (3, 1, "7", "x"),
        (4, 3, "7", "x"), (5, 6, "7", "x"), (6, 10, "7", "x"),
        (7, 1034, "7", "x"))
    val got = EventAnalytics
      .interArrivalHistogram(df, "user_id", "ts", "event_id")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === Map(0 -> 1L, 1 -> 1L, 2 -> 2L, 3 -> 1L, 11 -> 1L))
  }

  test("interArrivalHistogram: gaps never cross users; ties order by id") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((1L, 100L, 1L), (2L, 200L, 2L), (3L, 100L, 1L))
      .toDF("event_id", "t_s", "user_id")
      .withColumn("ts", timestamp_seconds(col("t_s")))
    val got = EventAnalytics
      .interArrivalHistogram(df, "user_id", "ts", "event_id")
      .agg(sum("cnt")).collect()(0).getLong(0)
    // user 1 has two events (one zero gap), user 2 has one (no gap)
    assert(got === 1L)
  }

  test("funnel: strict ordering — an early purchase does not convert") {
    val df = ev(
      // u1: clean view(10) -> click(20) -> purchase(30)
      (1, 10, "1", "view"), (2, 20, "1", "click"), (3, 30, "1", "purchase"),
      // u2: purchase(5) BEFORE view(10) -> click(20); no later purchase
      (4, 5, "2", "purchase"), (5, 10, "2", "view"), (6, 20, "2", "click"),
      // u3: view only
      (7, 10, "3", "view"),
      // u4: click then view — never enters stage 2
      (8, 10, "4", "click"), (9, 20, "4", "view"))
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 4L, 2 -> 2L, 3 -> 1L))
  }

  test("funnel: same-timestamp stage does not count (strictly after)") {
    val df = ev((1, 10, "1", "view"), (2, 10, "1", "click"))
    val got = EventAnalytics.funnel(df, "user_id", "ts", "event_type",
        Seq("view", "click"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 1L, 2 -> 0L))
  }

  test("funnel is non-increasing on the corpus table") {
    val counts = EventAnalytics.funnel(
        Tables.events(spark, SparkSuite.sf0001), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage").collect().map(_.getLong(2))
    assert(counts.length === 3 && counts(0) > 0)
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("robustOutliers: planted spike flags, bulk does not; lower median/MAD are data values; MAD=0 never flags") {
    val s = spark
    import s.implicits._
    // group A: tight values 10..20 + one 500 spike; group B: constant
    val rows = (1L to 11L).map(i => (i, "a", 9.0 + i)) ++
      Seq((99L, "a", 500.0)) ++ (200L to 205L).map(i => (i, "b", 7.0))
    val df = rows.toDF("event_id", "event_type", "value")
    val got = EventAnalytics.robustOutliers(df, "event_type", "value",
        "event_id").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5), r.getInt(6)))).toMap
    // group a: n=12, lower median = 6th value = 15; adevs
    // 5,4,3,2,1,0,1,2,3,4,5,485 → sorted lower median (6th) = 3
    assert(got(99L)._1 === 15.0 && got(99L)._2 === 3.0)
    assert(got(99L)._4 === 1, "the spike flags")
    assert((1L to 11L).forall(got(_)._4 === 0), "the bulk does not flag")
    // 0.6745·(500−15)/3, round 4
    assert(math.abs(got(99L)._3 - math.rint(0.6745 * 485 / 3 * 1e4) / 1e4) < 1e-12)
    // group b: MAD = 0 → mscore 0, never an anomaly
    assert((200L to 205L).forall(i => got(i)._3 === 0.0 && got(i)._4 === 0))
    // the approx path agrees on this separated data
    val approx = EventAnalytics.robustOutliers(df, "event_type", "value",
        "event_id", exact = false).collect()
      .map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(approx === got.view.mapValues(_._4).toMap)
  }

  test("ewmaTrend: hand-computed fixed-point weights; recency dominates; groups isolated") {
    val s = spark
    import s.implicits._
    // group A, values 1,2,3 at days 1,2,3, window 3 → weights 4,2,1:
    //   d1: num=1·4=4,        den=4 → ewma 1.0
    //   d2: num=2·4+1·2=10,   den=6 → ewma 1.666667
    //   d3: num=3·4+2·2+1=17, den=7 → ewma 2.428571
    // group B is a lone row — its own window, ewma = its value
    val daily = Seq(("A", 1, 1L), ("A", 2, 2L), ("A", 3, 3L), ("B", 9, 5L))
      .toDF("g", "day", "cnt")
    val got = EventAnalytics.ewmaTrend(daily, "g", "day", "cnt", window = 3)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Int]("day")) ->
        ((r.getAs[Double]("ewma"), r.getAs[Double]("trend")))).toMap
    assert(got(("A", 1)) === ((1.0, 1.0)))
    assert(got(("A", 2))._1 === 1.666667)
    assert(got(("A", 2))._2 === math.rint(2.0 / 1.666667 * 1e6) / 1e6)
    assert(got(("A", 3))._1 === 2.428571)
    assert(got(("B", 9)) === ((5.0, 1.0)))
    // recency dominates: after a jump, EWMA sits closer to the new
    // level than the plain mean does
    val jump = (1 to 8).map(d => ("J", d, if (d <= 6) 10L else 100L))
      .toDF("g", "day", "cnt")
    val j8 = EventAnalytics.ewmaTrend(jump, "g", "day", "cnt")
      .filter(col("day") === 8).collect()(0)
    val mean = (6 * 10 + 2 * 100) / 8.0
    assert(j8.getAs[Double]("ewma") > mean,
      "half-life weighting must track the jump faster than the mean")
    assert(j8.getAs[Double]("trend") > 1.0 && j8.getAs[Double]("trend") < 2.0)
  }

  test("retention: offset 0 equals cohort size; conservation of user-days") {
    val df = ev(
      (1, 0, "1", "x"), (2, 86400, "1", "x"), (3, 3 * 86400, "1", "x"),
      (4, 0, "2", "x"),
      (5, 86400, "3", "x"), (6, 86400 + 100, "3", "x")) // same day twice
    val got = EventAnalytics.retention(df, "user_id", "ts")
      .collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("1970-01-01", 0) -> 2L, // users 1 and 2
      ("1970-01-01", 1) -> 1L, ("1970-01-01", 3) -> 1L, // user 1 returns
      ("1970-01-02", 0) -> 1L)) // user 3's cohort; dup day collapsed
  }
}
