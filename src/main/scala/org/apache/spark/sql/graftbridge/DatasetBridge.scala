package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal bridge to the `private[sql]` Dataset.ofRows constructor —
  * the standard public-extension technique for libraries that build
  * their own logical plans (the classic Spark runtime offers no
  * public LogicalPlan → DataFrame entry point). Nothing else from the
  * internal API is re-exported.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Rebuild a CHECKPOINTED frame's LogicalRDD leaf with explicit
    * statistics, reusing the already-materialized RDD.
    *
    * Why this exists: `Dataset.localCheckpoint` copies the child
    * plan's `Statistics` onto the leaf (`originStats`). An iterative
    * kernel that checkpoints every round therefore feeds round r's
    * stats into round r+1's plan, and because the size-only stats
    * visitor MULTIPLIES child sizes at every inner/outer join,
    * `sizeInBytes` compounds EXPONENTIALLY in the round number —
    * measured live at sf1, the k-truss peel's fifth round carried a
    * multi-million-digit BigInt and Catalyst's single-threaded stats
    * walk sat in BigInteger Toom-Cook multiplies for tens of minutes
    * while every executor core idled. Re-leafing with an honest
    * measured size (the caller knows the row count — the checkpoint
    * is eager and counted anyway) makes each round's planning cost
    * independent of the round number, and gives the join strategies
    * a real size instead of an astronomically inflated one.
    *
    * Non-LogicalRDD inputs are returned unchanged — but LOUDLY
    * (stderr warning): every current caller passes a frame straight
    * out of localCheckpoint, whose analyzed plan IS a bare
    * LogicalRDD. If a future refactor wraps the checkpoint (an extra
    * projection, a new Spark minor changing the plan shape), a silent
    * fall-through would quietly re-open the exponential-stats hole
    * and the multi-minute sf1 Catalyst stalls would return with no
    * signal (r16 advice). The origin constraints are dropped — the
    * iterative callers re-derive nothing from them. */
  def withStats(df: DataFrame, sizeInBytes: BigInt): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val cdf = df.asInstanceOf[classic.Dataset[Row]]
    cdf.queryExecution.analyzed match {
      case LogicalRDD(output, rdd, part, ord, streaming, stream) =>
        classic.Dataset.ofRows(cdf.sparkSession,
          LogicalRDD(output, rdd, part, ord, streaming, stream)(
            cdf.sparkSession, Some(Statistics(sizeInBytes)), None))
      case other =>
        System.err.println(
          s"[graftbridge] withStats: analyzed plan is ${other.nodeName}, " +
            "not a bare LogicalRDD — stats re-leaf NOT applied; iterative " +
            "checkpoint loops may re-enter exponential sizeInBytes growth")
        df
    }
  }
}
