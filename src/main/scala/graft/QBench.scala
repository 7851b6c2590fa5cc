package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query bench for optimization iteration: times only the
  * NAMED benchQueries with the full Bench methodology (same conf, same
  * benchWarm off the clock, `.count()` action, clearCache between
  * runs, median of `trials` interleaved rounds). This VM's throughput
  * swings between runs, so candidate plan changes are only comparable
  * when measured inside one JVM minutes apart — the full Bench's
  * 20-minute suite is too coarse a loop for that. Dev tool:
  * `runMain graft.QBench <sfDir> <query> [query...]`.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QBench <sfDir> <query> [query...]")
    val sfDir = args.head
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.benchQueries
    val unknown = names.filterNot(qs.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")

    spark.range(1L << 20).selectExpr("sum(id)").collect()
    try SparkEntry.benchWarm(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[qbench] benchWarm failed: ${e.getMessage}")
    }
    spark.catalog.clearCache()

    val trials = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(_.toIntOption).getOrElse(3)
    val runs = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    for (t <- 1 to trials; name <- names) {
      spark.sparkContext.setJobDescription(s"qbench $name t$t")
      val t0 = System.nanoTime()
      val n = qs(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      runs(name) = runs(name) :+ sec
      println(f"trial $t  $name%-28s $sec%8.3f s  ($n rows)")
    }
    println("--- medians")
    names.foreach { name =>
      val rs = runs(name).sorted
      println(f"$name%-28s median ${rs(rs.size / 2)}%8.3f  min ${rs.head}%8.3f")
    }
    spark.stop()
  }
}
