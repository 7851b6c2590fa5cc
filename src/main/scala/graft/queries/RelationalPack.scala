package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.{Pct, Text}

/** The reference's relational core re-expressed Spark-first
  * (SURVEY.md §2.2/§2.4): trimmed equality filter, projection,
  * empty→"empty" normalization, group-by count, and global
  * percentage-of-total.
  *
  * Reference semantics: filter (data/maple-exe.go:22-26), projection
  * (maple-exe.go:28,64), normalization (maple-exe.go:30-39), group
  * count (data/juice-exe.go:20-31), global-denominator percentage
  * (hadoop/TrafficReducer.java:29-38).
  *
  * Scale notes (100 TB design point):
  *  - every query projects before it shuffles, so parquet scans prune
  *    columns (check ReadSchema in explain);
  *  - filters are plain Catalyst predicates → pushed to the scan;
  *  - percentage-of-total broadcasts a 1-row global total instead of
  *    an empty-partition window (see [[graft.functions.Pct]]);
  *  - aggregates are partial (map-side combine) by construction.
  */
object RelationalPack extends QueryPack {

  /** Canonical traffic-shaped query: filter rows by one column's
    * trimmed value, group by another (normalized), count, and report
    * each group's share of the filtered total. This is the
    * reference's one real end-to-end workload (MP4-RUN-Command.txt)
    * transplanted onto `lineitem`.
    */
  def pctOfTotal(s: SparkSession, d: String): DataFrame = {
    // direct equality (not trim(col)===…) so the predicate pushes to
    // the parquet scan; trim-normalization semantics live where the
    // data is untyped text (Traffic CSV, MapleJuice UDFs)
    val counts = Tables.lineitem(s, d)
      .filter(col("l_linestatus") === "F")
      .select(Text.normalizeEmpty(col("l_returnflag")).as("grp"))
      .groupBy("grp").agg(count(lit(1)).as("cnt"))
    Pct.withPctOfTotal(counts, "cnt", "pct")
      .withColumn("pct", round(col("pct"), 4))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_eq" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_custkey"),
                col("o_orderstatus"), col("o_totalprice"))),

    "q_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    "q_normalize_empty" -> ((s, d) =>
      Tables.customer(s, d)
        .select(col("c_custkey"),
                Text.normalizeEmpty(col("c_mktsegment")).as("segment"))),

    "q_group_count" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("cnt"))),

    "q_agg_sum" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
             count(lit(1)).as("cnt"))),

    "q_pct_of_total" -> (pctOfTotal _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_filter_eq" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin,

    "q_project" ->
      "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem",

    "q_normalize_empty" ->
      """SELECT c_custkey,
        |  CASE WHEN c_mktsegment IS NULL OR length(trim(c_mktsegment)) = 0 THEN 'empty'
        |       ELSE trim(c_mktsegment) END AS segment
        |FROM customer""".stripMargin,

    "q_group_count" ->
      "SELECT l_returnflag, count(*) AS cnt FROM lineitem GROUP BY 1",

    "q_agg_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_pct_of_total" ->
      """SELECT grp, cnt, round(100.0 * cnt / sum(cnt) OVER (), 4) AS pct
        |FROM (
        |  SELECT CASE WHEN l_returnflag IS NULL OR length(trim(l_returnflag)) = 0 THEN 'empty'
        |              ELSE trim(l_returnflag) END AS grp,
        |         count(*) AS cnt
        |  FROM lineitem WHERE l_linestatus = 'F' GROUP BY 1
        |)""".stripMargin,
  )
}
