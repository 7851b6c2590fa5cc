package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.functions.Pct
import graft.operators.{HashPartition, MapleJuice, PartitionMode, RangePartition}

/** Per-key count produced by the juice stage of the canonical job. */
case class KeyCount(grp: String, cnt: Long)

/** The canonical traffic-shaped workload re-expressed on the generic
  * MapleJuice UDF API (SURVEY.md §3.2): maple = filter on one
  * positional CSV field + emit another as the key (reference
  * data/maple-exe.go:16-69, with its empty→"empty" normalization at
  * :30-39); juice = per-key count (data/juice-exe.go:20-31);
  * percentage over the global filtered total appended afterwards
  * (hadoop/TrafficReducer.java:29-38 semantics).
  *
  * The rows are serialized to CSV lines first — the UDF surface is
  * deliberately opaque (positional, untyped, SURVEY.md §1.2), which
  * is exactly why these queries also exist in Catalyst form in
  * [[RelationalPack]]; this pack proves the API computes the same
  * answer (same oracle as q_pct_of_total).
  */
object MaplePack extends QueryPack {

  /** maple UDF mirroring data/maple-exe.go:16-69 on a 2-field line
    * "linestatus,returnflag": keep rows whose trimmed field 0 equals
    * `param`, emit normalized field 1 as the key.
    */
  def trafficMaple(param: String)(line: String): Iterator[(String, String)] = {
    val parts = line.split(",", -1)
    if (parts.length < 2 || parts(0).trim != param) Iterator.empty
    else {
      val v = parts(1).trim
      val key = if (v.isEmpty) "empty" else v
      Iterator((key, key))
    }
  }

  /** juice UDF mirroring data/juice-exe.go:20-31: count values per key. */
  def countJuice(key: String, values: Iterator[String]): Iterator[KeyCount] =
    Iterator(KeyCount(key, values.size.toLong))

  def pctViaMapleJuice(s: SparkSession, d: String,
                       mode: PartitionMode): DataFrame = {
    import s.implicits._
    // NULL cells serialize as empty fields (concat_ws alone would
    // drop them and shift the positional fields the UDF indexes)
    val lines = Tables.lineitem(s, d)
      .select(concat_ws(",",
        coalesce(col("l_linestatus").cast("string"), lit("")),
        coalesce(col("l_returnflag").cast("string"), lit(""))))
      .as[String]
    val kv = MapleJuice.maple(lines, numTasks = 4)(trafficMaple("F"))
    val counts = MapleJuice.juice(kv, numTasks = 4, mode)(countJuice).toDF()
    Pct.withPctOfTotal(counts, "cnt", "pct")
      .withColumn("pct", round(col("pct"), 4))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_maple_juice_hash"  -> ((s, d) => pctViaMapleJuice(s, d, HashPartition)),
    "q_maple_juice_range" -> ((s, d) => pctViaMapleJuice(s, d, RangePartition)),
  )

  /** Same oracle as q_pct_of_total: the API must agree with the
    * Catalyst formulation (and with DuckDB) bit-for-bit. */
  private val pctOracle =
    """SELECT grp, cnt, round(100.0 * cnt / sum(cnt) OVER (), 4) AS pct
      |FROM (
      |  SELECT CASE WHEN l_returnflag IS NULL OR length(trim(l_returnflag)) = 0 THEN 'empty'
      |              ELSE trim(l_returnflag) END AS grp,
      |         count(*) AS cnt
      |  FROM lineitem WHERE trim(l_linestatus) = 'F' GROUP BY 1
      |)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_maple_juice_hash"  -> pctOracle,
    "q_maple_juice_range" -> pctOracle,
  )
}
