package graft.operators

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard for compute-heavy narrow stages (minhash
  * signing, hyperplane projection): a small parquet file arrives as
  * ONE scan partition, which would serialize the whole pass onto a
  * single core.
  */
private[graft] object Spread {

  /** Repartition `df` to the cluster's default parallelism when its
    * PLANNED scan width would be narrower — judged from the logical
    * plan's size estimate against the scan split size, the same
    * arithmetic the file-scan planner applies (est partitions ≈
    * stats.sizeInBytes / files.maxPartitionBytes). The check costs
    * one logical-stats lookup; `df.rdd.getNumPartitions` would build
    * the entire physical plan and translate it to an RDD just to read
    * a count (the round-10 advice item).
    *
    * Heuristic, and safe in both error directions: an UNDERestimate
    * repartitions a frame the scan would have split anyway — one
    * redundant shuffle of a small frame; an OVERestimate skips the
    * spread on a frame that arrives narrow — the pre-advice behavior
    * for non-scan inputs. Correctness never depends on it. The stats
    * estimate is uncompressed in-memory bytes while parquet splits on
    * compressed bytes, so the comparison runs ~3× conservative —
    * exactly the direction that favors spreading a borderline input.
    */
  def ensureWidth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      catch { case scala.util.control.NonFatal(_) => 128L << 20 }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < BigInt(target) * splitBytes) df.repartition(target) else df
  }
}
