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
    * The estimate is only trusted in the direction where being wrong
    * is cheap: a SMALL estimate concludes "narrow" and repartitions
    * immediately (worst case: one redundant shuffle of a frame the
    * stats already bound as small). A LARGE estimate proves nothing —
    * a big unsplittable gzip, an upstream `coalesce(1)`, or a single
    * oversized row-group all arrive narrow despite large stats (the
    * round-12 advice item) — so the "wide enough" conclusion is
    * always confirmed against the EXACT `rdd.getNumPartitions`,
    * paying the one-off physical translation only for frames the
    * cheap check could not already classify. The Long.MaxValue
    * no-estimate sentinel lands in the same exact-check branch.
    * Correctness never depends on this guard, only parallelism. */
  def ensureWidth(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val splitBytes =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
      catch { case scala.util.control.NonFatal(_) => 128L << 20 }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val trustedNarrow =
      est < BigInt(Long.MaxValue) / 2 && est < BigInt(target) * splitBytes
    if (trustedNarrow) df.repartition(target)
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
