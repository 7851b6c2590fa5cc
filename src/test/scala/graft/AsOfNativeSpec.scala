package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin
import graft.plans.AsOfJoinNative

/** The native (custom LogicalPlan/Strategy/SparkPlan) as-of join must
  * agree exactly with the compositional window formulation — which is
  * itself checked against DuckDB's ASOF JOIN in the correctness gate.
  */
class AsOfNativeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("native as-of join matches the compositional operator on events") {
    val ev = Tables.events(spark, SparkSuite.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("pts_us"),
              col("value"))

    val native = AsOfJoinNative.asOf(
        clicks, purchases.withColumnRenamed("p_user", "user_id"),
        "user_id", "ts_us", "pts_us")
      .select(col("event_id"),
              coalesce(col("pts_us"), lit(-1L)).as("ats"),
              coalesce(col("value"), lit(-1.0)).as("av"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val compositional = AsOfJoin.asOf(clicks,
        purchases.withColumnRenamed("p_user", "user_id"),
        "user_id", "ts_us", "pts_us", Seq("value"))
      .select(col("event_id"),
              coalesce(col("asof_ts"), lit(-1L)).as("ats"),
              coalesce(col("asof_value"), lit(-1.0)).as("av"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(native === compositional)
    assert(native.nonEmpty)
    assert(native.exists(_._2 == -1L), "expected some no-match rows")
  }

  test("native exec plans one exchange per side and an AsOfJoinExec node") {
    val spark2 = spark
    import spark2.implicits._
    val l = Seq((1L, 10L, "a"), (2L, 5L, "b")).toDF("k", "t", "tag")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "rt", "v")
    val out = AsOfJoinNative.asOf(l, r.withColumnRenamed("k", "k"), "k", "t", "rt")
    val plan = out.queryExecution.executedPlan.toString
    // nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsOfJoin"))
    assert("Exchange hashpartitioning".r.findAllIn(plan).size === 2,
      s"expected exactly one exchange per side in:\n$plan")
    val rows = out.collect().map(x =>
      (x.getAs[String]("tag"), Option(x.getAs[java.lang.Double]("v")))).toSet
    assert(rows === Set(("a", Some(1.0)), ("b", None)))
  }

  test("self-derived sides (shared exprIds) are auto-freshened, not pruned apart") {
    // both legs from ONE scan, no manual aliasing: user_id carries the
    // same exprId on both sides, which used to die at execution with
    // INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND once ColumnPruning conflated
    // the two occurrences (round-13 q_asof migration)
    val ev = Tables.events(spark, SparkSuite.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pts_us"), col("value"))

    val joined = AsOfJoinNative.asOf(clicks, purchases, "user_id", "ts_us", "pts_us")
      .toDF("event_id", "user_id", "ts_us", "r_user_id", "pts_us", "value")
    // the projection that used to trigger the pruning bug: keeps the
    // LEFT key and only part of the right side
    val got = joined
      .select(col("event_id"), col("user_id"),
        coalesce(col("pts_us"), lit(-1L)).as("ats"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // compare against the compositional operator on freshened inputs
    val purchasesFresh = purchases
      .select(col("user_id").as("p_user"), col("pts_us"), col("value"))
      .withColumnRenamed("p_user", "user_id")
    val want = AsOfJoin.asOf(clicks, purchasesFresh,
        "user_id", "ts_us", "pts_us", Seq("value"))
      .select(col("event_id"), col("user_id"),
        coalesce(col("asof_ts"), lit(-1L)).as("ats"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(got === want)
    assert(got.nonEmpty)
  }

  test("bucketed inputs make the native as-of exchange-free (the 100 TB layout)") {
    // the production shape: the event log is stored bucketed+sorted by
    // the entity key ONCE, and every recurring as-of enrichment reads
    // co-located buckets — the one exchange per side the ad-hoc plan
    // needs becomes zero (only a cheap per-bucket sort on (key, ts)
    // remains, since the layout sorts by key alone)
    import graft.sources.Bucketed
    val ev = Tables.events(spark, SparkSuite.sf0001)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pts_us"), col("value"))
    Bucketed.write(clicks, "graft_clicks_bkt", "user_id", buckets = 8)
    Bucketed.write(purchases, "graft_purch_bkt", "user_id", buckets = 8)

    val joined = AsOfJoinNative.asOf(
      Bucketed.read(spark, "graft_clicks_bkt"),
      Bucketed.read(spark, "graft_purch_bkt"),
      "user_id", "ts_us", "pts_us")
    val rows = joined
      .select(col("event_id"), coalesce(col("pts_us"), lit(-1L)).as("ats"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(!Bucketed.hasShuffle(joined),
      s"bucketed as-of must plan zero exchanges:\n${joined.queryExecution.executedPlan}")
    // identical answers to the ad-hoc (shuffling) plan
    val adHoc = AsOfJoinNative.asOf(clicks,
        purchases.select(col("user_id").as("p_user"), col("pts_us"), col("value"))
          .withColumnRenamed("p_user", "user_id"),
        "user_id", "ts_us", "pts_us")
      .select(col("event_id"), coalesce(col("pts_us"), lit(-1L)).as("ats"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rows === adHoc)
    assert(rows.nonEmpty)
  }
}
