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
}
