package graft

import org.apache.spark.sql.SparkSession

/** One-number probe for the distributed k-truss at scale: times the
  * whole q_dup_ktruss shape (sharedGramPairs + kTruss + count) at a
  * given data dir and `localSolveMaxEdges` bound — the measurement
  * behind SCALE_r16/r17's pure-distributed numbers, kept as a main so
  * the probe is repeatable instead of ad-hoc.
  *
  * Usage: runMain graft.TrussProbe [dataDir] [localSolveMaxEdges] [runs]
  *   localSolveMaxEdges = 0 pins the pure distributed loop (no driver
  *   handoff — the true-100×-scale path where survivors never fit);
  *   omit for the production hybrid default.
  */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/sf1")
    val localMax = args.lift(1).map(_.toLong).getOrElse(0L)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val times = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      val out = graft.operators.Components.kTruss(
        graft.operators.Dedup.sharedGramPairs(
          Tables.documents(spark, dir), "doc_id", "text", minShared = 2),
        k = 4, localSolveMaxEdges = localMax).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TRUSS_PROBE run $i: $dt%.1f s, $out surviving edges " +
        s"(dir=$dir localSolveMaxEdges=$localMax)")
      spark.catalog.clearCache()
      dt
    }
    println(f"TRUSS_PROBE median: ${times.sorted.apply(times.size / 2)}%.1f s")
    spark.stop()
  }
}
