// Dev scratch: write the formatted physical plan of named bench
// queries to files — the before/after plan evidence the optimization
// rounds commit under plans/r{n}/.
// Run: /tmp/runjava.sh graft.tools.PlanDump <sfDir> <outDir> <tag> <query> [query...]
package graft.tools

import org.apache.spark.sql.SparkSession

object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: PlanDump <sfDir> <outDir> <tag> <query>...")
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names = args.drop(3).toSeq
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.SparkEntry.benchWarm(spark, dir)
    catch { case e: Throwable => System.err.println(s"warm: ${e.getMessage}") }
    java.nio.file.Files.createDirectories(outDir)
    names.foreach { name =>
      val df = graft.SparkEntry.benchQueries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val f = outDir.resolve(s"${name}_$tag.txt")
      java.nio.file.Files.writeString(f, plan)
      val ex = "Exchange".r.findAllIn(plan).size
      println(s"$name -> $f (${plan.count(_ == '\n')} lines, $ex Exchange)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
