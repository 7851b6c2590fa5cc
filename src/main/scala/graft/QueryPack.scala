package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * `queries`: name -> (spark, sfDir) => result DataFrame.
  * `oracleSql`: name -> equivalent ANSI SQL that DuckDB can run on the
  * same parquet tables. Queries without an oracle entry get a weaker
  * rows-only check from the driver (used for ops whose semantics are
  * not SQL-expressible in DuckDB, e.g. MinHash-LSH candidates).
  *
  * Column names MUST match between the Spark result and the oracle SQL
  * (the driver sorts columns by name and hashes values). Alias every
  * computed column on BOTH sides.
  *
  * SparkEntry aggregates all packs; a name collision across packs is a
  * bug and is asserted against in the test suite.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracleSql: Map[String, String]

  /** Bench-only replacements, keyed by an existing `queries` name: the
    * PRODUCTION shape of an operator, for queries whose Verify form
    * carries oracle scaffolding (element-wise verification explodes)
    * that would dominate the timing. Verify keeps running the full
    * pinned form; Bench times the override. Every key must also exist
    * in `queries` (asserted in SparkEntrySpec). */
  def benchOverrides: Map[String, (SparkSession, String) => DataFrame] = Map.empty

  /** Bench-only warm hook: build this pack's memoized per-data-dir
    * artifacts (pair stores, posting indexes, ANN layouts, codebooks)
    * BEFORE the timed window. The memos exist because production
    * builds these once and serves many queries from them — but
    * whichever timed query happened to arrive first was paying the
    * build inside its first run, putting 3-4× first-run spreads on
    * the dedup family (r15 verdict #6). Warming off the clock makes
    * every timed run the serving shape the override documents.
    * Verify never calls this — the gate keeps timing nothing. */
  def benchWarm(spark: SparkSession, sfDir: String): Unit = ()
}
