package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by every query pack.
  *
  * Semantics mirror the reference engine's map/reduce executables
  * (see SURVEY.md §2.2): the reference normalizes empty cells to the
  * literal "empty" (reference data/maple-exe.go:30-39) and sanitizes
  * group keys for filename safety (data/maple-exe.go:34-35). Here the
  * same semantics are expressed as codegen-friendly Catalyst
  * expressions so they stay inside whole-stage codegen.
  */
object Text {

  /** Reference empty-cell normalization: trim, and map the empty
    * string to the literal "empty" (data/maple-exe.go:30-32,
    * hadoop/TrafficMapper.java:37-43). `""` and `" "` collapse to the
    * same class; "None" vs "NONE" stay distinct (case-sensitive).
    * The reference has no true NULL (SURVEY.md §1.2) — but Spark's CSV
    * reader surfaces empty unquoted cells as NULL, so NULL must land
    * in the same "empty" class or those rows silently form a null
    * group.
    */
  def normalizeEmpty(c: Column): Column =
    when(c.isNull || length(trim(c)) === 0, lit("empty")).otherwise(trim(c))

  /** Reference key sanitization `[/ ]` -> `_` (data/maple-exe.go:34-35).
    * Only needed for output-layout compatibility; keys stay data here.
    */
  def sanitizeKey(c: Column): Column = regexp_replace(c, "[/ ]", "_")
}

/** Scalable percentage-of-total.
  *
  * The reference computes each group's share of the global filtered
  * total (hadoop/TrafficReducer.java:29-38 — the Hadoop oracle's
  * global denominator is the intended semantics; the Go juice's
  * per-file denominator is a fidelity bug, see SURVEY.md §2.4).
  *
  * At 100 TB an empty-partition window (`Window.partitionBy()`)
  * funnels the whole frame through a single task. Instead we compute
  * the one-row global total separately and broadcast-cross-join it:
  * the grouped side keeps its partitioning, the total is a 1-row
  * broadcast, and no single-task exchange appears in the plan.
  */
object Pct {
  def withPctOfTotal(grouped: DataFrame, countCol: String,
                     outCol: String): DataFrame = {
    val total = grouped.agg(sum(col(countCol)).as("__graft_total"))
    grouped.crossJoin(broadcast(total))
      .withColumn(outCol, col(countCol) * 100.0 / col("__graft_total"))
      .drop("__graft_total")
  }

  /** Reference output formatting "%.2f%%" (data/juice-exe.go:98,
    * hadoop/TrafficReducer.java:38). Kept out of DuckDB-checked
    * queries (printf rounding modes differ across engines); pinned by
    * the ScalaTest traffic golden instead.
    */
  def pctString(c: Column): Column = format_string("%.2f%%", c)
}
