package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{CatalogPack, DedupPack, EventPack, JoinPack, MaplePack,
  RelationalPack, SelectPack, ShapePack, SimilarityPack, TextPack}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * All operators live in [[QueryPack]]s under graft.queries; this
  * object is the aggregation point the driver's Verify/Bench mains
  * iterate.
  */
object SparkEntry {

  /** Every shipped pack. Order is stable for reproducible listings. */
  def packs: Seq[QueryPack] = Seq(
    RelationalPack,
    SelectPack,
    JoinPack,
    ShapePack,
    MaplePack,
    DedupPack,
    SimilarityPack,
    TextPack,
    EventPack,
    CatalogPack,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The canonical traffic-shaped percentage-of-total query
    * (SURVEY.md §0) over the smallest scale factor.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalPack.pctOfTotal(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracleSql).toMap

  /** What Bench times: `queries` with any production-shape
    * [[QueryPack.benchOverrides]] applied. Verify always runs the
    * un-overridden form (the correctness pin). */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    queries ++ packs.flatMap(_.benchOverrides)

  /** Build every pack's memoized per-data-dir bench artifacts off the
    * clock (see [[QueryPack.benchWarm]]). Bench calls this once per
    * run before the timed loop. */
  def benchWarm(spark: SparkSession, sfDir: String): Unit =
    packs.foreach(_.benchWarm(spark, sfDir))
}
