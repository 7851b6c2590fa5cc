package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Interleaved measurement of the span-dedup stride knob. Stride is
  * the 100 TB lever of [[Dedup.spanProfile]]: cost divides by stride
  * while any duplicated region of length ≥ k + stride − 1 still
  * intersects a sampled window on both copies — this harness shows
  * the cost curve AND how much detection actually moves on real data
  * (flagged docs + dup-window mass per stride). Interleaved in one
  * JVM because this VM's throughput swings 2-4× between runs. Dev
  * tool: `runMain graft.SpanBench [sfDir]`.
  */
object SpanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    import org.apache.spark.sql.functions.{col, sum}

    def timeStride(stride: Int): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val prof = Dedup.spanProfile(docs, "doc_id", "text", k = 20,
        stride = stride)
      val row = prof.agg(
        sum(col("n_dup_spans")).as("dup_windows"),
        sum(col("flagged")).as("flagged")).first()
      println(f"stride=$stride%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"dup_windows=${row.getAs[Long]("dup_windows")}%-9d " +
        f"flagged=${row.getAs[Long]("flagged")}")
    }

    for (trial <- 1 to 3) {
      println(s"--- trial $trial")
      Seq(1, 2, 4, 8).foreach(timeStride)
    }
    spark.stop()
  }
}
