package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}

/** Joins. The reference recognizes JOIN but never implemented it
  * (reference file_server/fileserver.py:1383-1384 logs and returns) —
  * SURVEY.md §2.5 schedules real `Dataset.join` as the documented
  * extension, so a reference user gets the operator their REPL
  * pretended to have.
  *
  * Scale notes: dimension sides (customer at ~1.5k/SF, nation, region)
  * are explicitly `broadcast()` so the fact side never shuffles for
  * them; the lineitem⋈orders join is a genuine big-big shuffle join on
  * the join key, which is the partitioning Catalyst/AQE would pick for
  * co-location at any SF. Aggregates are rounded on both sides so the
  * hash compare is FP-order-proof.
  */
object JoinPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // broadcast dim join: orders ⋈ customer, revenue per market segment
    "q_join_broadcast" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 2).as("revenue"),
             count(lit(1)).as("cnt"))
    }),

    // big-big shuffle join on the key both sides are large in
    "q_join_big" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             count(lit(1)).as("cnt"))
    }),

    // EXISTS: customers having at least one open order
    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // NOT EXISTS: customers with no pending ('P') order
    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "P")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // three-way: fact ⋈ dim ⋈ dim with two broadcasts
    "q_join_threeway" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val o = Tables.orders(s, d)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    // Bloom-pruned semi-join: lineitems of suppliers from one nation.
    // The dim (a few % of suppliers) builds a 2^16-bit bloom; the
    // fact side drops non-matching rows MAP-SIDE (codegen'd
    // xxhash64+mask filter) before the join sees them; an exact
    // left-semi behind the probe makes the output sketch-free, so the
    // oracle is a plain EXISTS. At 100 TB this is the "prune before
    // you shuffle" path for selective dims too big to broadcast.
    "q_bloom_semi" -> ((s, d) => {
      val dim = Tables.supplier(s, d)
        .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
      graft.operators.BloomFilter.prunedSemiJoin(
          Tables.lineitem(s, d), "l_suppkey", dim, "s_suppkey",
          numBits = 1 << 16)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"),
             round(sum(col("l_quantity")), 2).as("sum_qty"))
    }),

    // RANGE join via RangeJoin's binned equi-join (a bare non-equi
    // condition would plan BroadcastNestedLoop — quadratic scan work):
    // how many lineitems shipped inside each sampled order's first
    // week. Dates quantized to epoch DAYS up front (the gate compares
    // no timestamps), binWidth = the 7-day interval length.
    "q_range_join" -> ((s, d) => {
      // datediff, not unix_micros: the parquet dates are TIMESTAMP_NTZ
      // (unix_micros rejects NTZ) and midnight-aligned, so epoch days
      // == calendar-day diff on both engines
      val iv = Tables.orders(s, d)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1970-01-01"))
            .cast("long").as("lo_day"))
        .withColumn("hi_day", col("lo_day") + 6)
      val pts = Tables.lineitem(s, d)
        .select(datediff(col("l_shipdate"), lit("1970-01-01"))
          .cast("long").as("ship_day"))
      graft.operators.RangeJoin
        .pointsInIntervals(pts, "ship_day", iv, "lo_day", "hi_day", binWidth = 7)
        .groupBy(col("o_orderkey"), col("lo_day"), col("hi_day"))
        .agg(count(lit(1)).as("n_points"))
    }),

    // interval×interval overlap via the same binning (exactly-once by
    // later-start-bin tie-break, no dedup shuffle): which of one
    // sample's order weeks overlap which of a disjoint sample's
    "q_range_overlap" -> ((s, d) => {
      def weeks(mod: Int, key: String, lo: String, hi: String) =
        Tables.orders(s, d)
          .filter(col("o_orderkey") % 97 === mod)
          .select(col("o_orderkey").as(key),
            datediff(col("o_orderdate"), lit("1970-01-01"))
              .cast("long").as(lo))
          .withColumn(hi, col(lo) + 6)
      graft.operators.RangeJoin.intervalsOverlap(
          weeks(0, "a_key", "a_lo", "a_hi"),
          "a_lo", "a_hi",
          weeks(1, "b_key", "b_lo", "b_hi"),
          "b_lo", "b_hi", binWidth = 7)
        .select(col("a_key"), col("a_lo"), col("a_hi"),
          col("b_key"), col("b_lo"), col("b_hi"),
          (least(col("a_hi"), col("b_hi")) -
            greatest(col("a_lo"), col("b_lo")) + 1).as("overlap_days"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_join_broadcast" ->
      """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS cnt
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    "q_join_big" ->
      """SELECT o_orderstatus, round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q_join_semi" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,

    "q_join_anti" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,

    "q_join_threeway" ->
      """SELECT n_name, count(*) AS cnt,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    // the bloom probe is a pure pruning step — the oracle replays the
    // SEMANTICS (an exact semi-join) with no sketch in sight
    "q_bloom_semi" ->
      """SELECT l_returnflag, count(*) AS cnt,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM supplier
        |  WHERE s_suppkey = l_suppkey AND s_nationkey = 3)
        |GROUP BY 1""".stripMargin,

    // the binning is an implementation detail — the oracle replays the
    // SEMANTICS as a plain BETWEEN join (exact at gate scale)
    "q_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS lo_day,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) + 6 AS hi_day
        |  FROM orders WHERE o_orderkey % 97 = 0
        |),
        |pts AS (
        |  SELECT CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT) AS ship_day
        |  FROM lineitem
        |)
        |SELECT o_orderkey, lo_day, hi_day, count(*) AS n_points
        |FROM iv JOIN pts ON ship_day BETWEEN lo_day AND hi_day
        |GROUP BY 1, 2, 3
        |""".stripMargin,
    "q_range_overlap" ->
      """WITH a AS (
        |  SELECT o_orderkey AS a_key,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS a_lo,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) + 6 AS a_hi
        |  FROM orders WHERE o_orderkey % 97 = 0
        |),
        |b AS (
        |  SELECT o_orderkey AS b_key,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS b_lo,
        |    CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) + 6 AS b_hi
        |  FROM orders WHERE o_orderkey % 97 = 1
        |)
        |SELECT a_key, a_lo, a_hi, b_key, b_lo, b_hi,
        |  least(a_hi, b_hi) - greatest(a_lo, b_lo) + 1 AS overlap_days
        |FROM a JOIN b ON a_lo <= b_hi AND b_lo <= a_hi
        |""".stripMargin,
  )
}
