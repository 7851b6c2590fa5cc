package graft.operators

import org.apache.spark.sql.DataFrame

/** Minimum-parallelism guard for compute-heavy narrow stages (minhash
  * signing, hyperplane projection): a small parquet file arrives as
  * ONE scan partition, which would serialize the whole pass onto a
  * single core.
  */
private[graft] object Spread {

  /** Repartition `df` to the cluster's default parallelism when its
    * PLANNED width would be narrower — judged from the logical plan's
    * size estimate against the scan split size, the same arithmetic
    * the file-scan planner applies (est partitions ≈ stats.sizeInBytes
    * / files.maxPartitionBytes). For the file-scan inputs these
    * operators take, the estimate is the on-disk byte count (×
    * `spark.sql.sources.fileCompressionFactor`, default 1.0) — the
    * very number the planner splits on — so the check costs one
    * logical-stats lookup instead of building and translating the
    * whole physical plan the way `df.rdd.getNumPartitions` does (the
    * round-10 advice item).
    *
    * The failure direction matters: an OVERestimate (a frame whose
    * stats multiplied through joins, or a leaf that reports the
    * `defaultSizeInBytes` Long.MaxValue sentinel) would SKIP the
    * spread and silently serialize the compute pass — the regression
    * the round-11 review flagged. Post-shuffle frames are already
    * wide, so the join case is harmless; the sentinel case is not,
    * and falls back to the EXACT partition count (paying the one-off
    * RDD translation only for plans with no usable estimate). An
    * UNDERestimate merely repartitions a frame the scan would have
    * split anyway — one redundant shuffle of a small frame.
    * Correctness never depends on this guard, only parallelism. */
  def ensureWidth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      catch { case scala.util.control.NonFatal(_) => 128L << 20 }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est >= BigInt(Long.MaxValue) / 2) {
      // no usable estimate — take the exact (slower) check rather
      // than guess narrow
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    } else if (est < BigInt(target) * splitBytes) df.repartition(target)
    else df
  }
}
