package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
