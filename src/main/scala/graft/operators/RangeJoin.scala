package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair every point with every
  * interval containing it — `lo <= p <= hi` — WITHOUT the
  * BroadcastNestedLoopJoin Spark plans for a bare non-equi condition
  * (quadratic scan work, broadcast-sized build side) and without a
  * cartesian.
  *
  * The scale trick is BINNING, the standard distributed range-join
  * strategy (Spark itself ships it only behind range-join hints on
  * Databricks; open-source Spark has no native operator): quantize
  * the dimension into width-`binWidth` bins, explode each interval to
  * the bins it covers, map each point to its ONE bin, hash equi-join
  * on the bin, then verify the exact containment predicate. Join cost
  * becomes |points| + Σ interval_spans/binWidth shuffle rows — local
  * pairs instead of all pairs — and each (point, interval) pair meets
  * in exactly one bin (the point's), so no dedup pass is needed.
  *
  * `binWidth` tunes shuffle fan-out vs bucket selectivity: too big ⇒
  * wide bins pair points with far-away intervals (verify discards
  * them, but they rode the shuffle); too small ⇒ long intervals
  * explode into many bins. A good default is the typical interval
  * length. Intervals with `hi < lo` match nothing (verify kills
  * them); null bounds or points drop out at the bin computation, the
  * same rows an exact BETWEEN join would drop.
  *
  * Column contract: `points` and `intervals` keep all their columns
  * (name collisions must be resolved by the caller up front, like any
  * join); the output is the matched pairs.
  */
object RangeJoin {

  private def bin(c: Column, w: Long): Column = floor(c / lit(w)).cast("long")

  private def binned(df: DataFrame, loCol: String, hiCol: String,
                     w: Long): DataFrame =
    df.filter(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__graft_bin",
        explode(sequence(bin(col(loCol), w), bin(col(hiCol), w))))

  def pointsInIntervals(points: DataFrame, pCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(points.columns.toSet.intersect(intervals.columns.toSet).isEmpty,
      "points and intervals must not share column names — rename before joining")
    val p = points.withColumn("__graft_bin", bin(col(pCol), binWidth))
    p.join(binned(intervals, loCol, hiCol, binWidth), Seq("__graft_bin"))
      .filter(col(pCol) >= col(loCol) && col(pCol) <= col(hiCol))
      .drop("__graft_bin")
  }

  /** Interval×interval OVERLAP join — pairs where
    * `[loA,hiA] ∩ [loB,hiB] ≠ ∅` (`loA <= hiB && loB <= hiA`), same
    * binning strategy. Overlapping intervals can share MANY bins, so
    * exactly-once pairing needs a tie-break instead of a dedup pass:
    * a pair is emitted only from the bin of `greatest(loA, loB)` —
    * the later start, which any overlapping pair contains in both
    * covered-bin lists exactly once. No dropDuplicates, so the output
    * never re-shuffles on the (wide) pair key. */
  def intervalsOverlap(a: DataFrame, loA: String, hiA: String,
                       b: DataFrame, loB: String, hiB: String,
                       binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    require(a.columns.toSet.intersect(b.columns.toSet).isEmpty,
      "the two interval frames must not share column names — rename before joining")
    binned(a, loA, hiA, binWidth)
      .join(binned(b, loB, hiB, binWidth), Seq("__graft_bin"))
      .filter(col(loA) <= col(hiB) && col(loB) <= col(hiA) &&
        col("__graft_bin") === bin(greatest(col(loA), col(loB)), binWidth))
      .drop("__graft_bin")
  }
}
