// Dev scratch: run one bench query and dump per-stage metrics (wall,
// task time, shuffle bytes) so optimization targets the stage that
// actually costs. Run: /tmp/runjava.sh graft.tools.StageProbe <sfDir> <query> [reps]
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable.ListBuffer

object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val q = args(1)
    val reps = args.lift(2).flatMap(_.toIntOption).getOrElse(2)
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = ListBuffer.empty[(Int, String, Long, Long, Long, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += ((si.stageId,
          si.name.split("\n").head.take(60), wall,
          m.executorRunTime, m.shuffleReadMetrics.totalBytesRead,
          m.shuffleWriteMetrics.bytesWritten,
          m.peakExecutionMemory, si.numTasks))
      }
    })
    spark.range(1L << 20).selectExpr("sum(id)").collect()
    try graft.SparkEntry.benchWarm(spark, dir)
    catch { case e: Throwable => System.err.println(s"warm: ${e.getMessage}") }
    spark.catalog.clearCache()
    val fn = graft.SparkEntry.benchQueries(q)
    for (r <- 1 to reps) {
      stages.clear()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // give the listener bus a beat to drain
      Thread.sleep(500)
      println(f"== rep $r: $q $sec%.3f s  ($n rows)  stages=${stages.size}")
      val sorted = stages.sortBy(-_._3)
      sorted.take(25).foreach { case (id, name, wall, run, sr, sw, _, nt) =>
        println(f"  stage $id%4d wall=${wall}%6d ms run=${run}%7d ms " +
          f"sRead=${sr / 1024}%8d KB sWrite=${sw / 1024}%8d KB tasks=$nt%3d  $name")
      }
      println(f"  total stage wall: ${sorted.map(_._3).sum} ms over ${stages.size} stages")
    }
    spark.stop()
  }
}
