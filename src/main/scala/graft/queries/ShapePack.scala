package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryPack, Tables}

/** Row-shape operators: sort/limit (top-k), distinct, union-all
  * ("conglomerate"), and window functions.
  *
  * The reference's only set op is the implicit UNION ALL of partial
  * outputs (reference file_server/fileserver.py:598-635,
  * "conglomerate"); user-facing sort/limit/distinct/windows are absent
  * there (SURVEY.md §2.6/§2.9) and are shipped here as the Spark-free
  * extensions a switching user expects.
  *
  * Determinism: every ORDER BY / window ordering carries a unique-key
  * tiebreak so LIMIT and rank results are stable across engines.
  * Top-k via orderBy+limit is Spark's TakeOrderedAndProject — each
  * partition keeps only k rows, the driver merges n_partitions*k, so
  * it scales to arbitrarily wide scans.
  */
object ShapePack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_topk" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_totalprice"))
        .limit(10)),

    "q_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()),

    // "conglomerate": union-all of independently produced slices
    "q_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderstatus"))
        .unionAll(
          o.filter(col("o_orderstatus") === "O")
            .select(col("o_orderkey"), col("o_orderstatus")))
    }),

    // ranking window: top-3 priciest lines per return flag
    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
                 col("l_linenumber").asc)
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
    }),

    // running-total window per customer in order time
    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"))
        .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
        .select(col("o_custkey"), col("o_orderkey"), col("running"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",

    "q_union" ->
      """SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'""".stripMargin,

    "q_window_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem
        |) WHERE rn <= 3""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
        |FROM orders""".stripMargin,
  )
}
