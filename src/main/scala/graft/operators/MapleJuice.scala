package graft.operators

import org.apache.spark.sql.{Column, Dataset, Encoder}
import org.apache.spark.sql.functions.col

/** Reduce-side partitioning knob of the reference's juice stage:
  * `hash(key) % n` (reference file_server/fileserver.py:682-698) or
  * lexicographic contiguous ranges (fileserver.py:700-732, string
  * sort at :713 — NOT numeric). Grouped results are invariant under
  * the choice; only the key→task assignment differs (SURVEY.md §2.3).
  */
sealed trait PartitionMode
case object HashPartition extends PartitionMode
case object RangePartition extends PartitionMode

/** The reference's core extensibility story, typed: MapleJuice is a
  * UDF framework whose operators are arbitrary user functions over
  * lines (SURVEY.md §2.7).
  *
  *  - `maple` = map UDF: any `String => Iterator[(key, value)]`
  *    (contract of `./maple_exe <prefix> <param>` at reference
  *    fileserver.py:378; reads sharded lines, writes `prefix--key`
  *    files — the filename-encoded key IS the shuffle key, so here it
  *    is simply the `_1` of the emitted pair).
  *  - `juice` = reduce UDF: any `(key, Iterator[value]) => Iterator[R]`
  *    (contract of `./juice_exe <prefix>` at fileserver.py:561-571;
  *    reads all files of its partition's keys, emits per-key output).
  *
  * Spark-first execution: ONE shuffle total. The key/value pairs are
  * exchanged with the requested partitioner (`repartition(n, key)` =
  * the reference's hash mode; `repartitionByRange(n, key)` = its
  * range mode, with sampled rather than exact boundaries), sorted
  * within partitions, and reduced by streaming over equal-key runs —
  * no second exchange from `groupByKey`, no driver involvement, and
  * re-execution is exactly-once (the reference's append-mode re-runs
  * can double-count, SURVEY.md §2.8 — intentionally improved).
  */
object MapleJuice {

  /** Resize parallelism without a gratuitous full shuffle: narrow
    * coalesce when shrinking, shuffle only when growing. The reference
    * reshards input into exactly n row-contiguous chunks
    * (fileserver.py:265-289); n is clamped like the reference clamps
    * to row/member count (fileserver.py:274,501).
    *
    * The coalesce-vs-repartition pick needs the EXACT current
    * partition count (`coalesce(n)` silently keeps fewer when the
    * input has fewer — the numTasks contract would break), so this is
    * the one site that keeps the `.rdd.getNumPartitions` touch: a
    * physical-plan translation on the driver, paid once per job
    * submission, no job run. The estimate-based guard
    * ([[Spread.ensureWidth]]) is not exact enough here.
    */
  private def resized[T](ds: Dataset[T], numTasks: Int): Dataset[T] = {
    val n = math.max(1, numTasks)
    if (ds.rdd.getNumPartitions >= n) ds.coalesce(n) else ds.repartition(n)
  }

  /** Map stage. `f` sees one raw line and emits zero or more
    * (key, value) pairs.
    */
  def maple(lines: Dataset[String], numTasks: Int)(
      f: String => IterableOnce[(String, String)]): Dataset[(String, String)] = {
    val spark = lines.sparkSession
    import spark.implicits._
    resized(lines, numTasks).flatMap(f)
  }

  /** Reduce stage. `g` sees one key and the iterator of its values
    * (arbitrary order, as in the reference where per-key files arrive
    * from whichever maple task produced them).
    */
  def juice[R: Encoder](kv: Dataset[(String, String)], numTasks: Int,
                        mode: PartitionMode = HashPartition)(
      g: (String, Iterator[String]) => IterableOnce[R]): Dataset[R] = {
    val n = math.max(1, numTasks)
    // an `.as[(String, String)]` view keeps its source column names,
    // so resolve the key column positionally rather than assuming `_1`
    val key: Column = col(kv.columns(0))
    val parted = mode match {
      case HashPartition  => kv.repartition(n, key)
      case RangePartition => kv.repartitionByRange(n, key)
    }
    parted
      .sortWithinPartitions(key)
      .mapPartitions(it => groupRuns(it).flatMap { case (k, vs) => g(k, vs).iterator })
  }

  /** Group a key-sorted iterator into (key, values) runs, buffering
    * only one key's values at a time (the same footprint as the
    * reference's one-key-file-at-a-time juice loop,
    * data/juice-exe.go:20-31).
    */
  private[graft] def groupRuns(
      it: Iterator[(String, String)]): Iterator[(String, Iterator[String])] =
    new Iterator[(String, Iterator[String])] {
      private val buf = it.buffered
      def hasNext: Boolean = buf.hasNext
      def next(): (String, Iterator[String]) = {
        val k = buf.head._1
        val vs = Iterator.unfold(()) { _ =>
          if (buf.hasNext && buf.head._1 == k) Some((buf.next()._2, ())) else None
        }.toVector // materialize the run so callers may re-enter lazily.
        // Heap bound: ONE key's values must fit in a task's memory —
        // the same per-key bound as the reference's prefix--key.csv
        // intermediate file (one file per key read whole by juice,
        // fileserver.py:571-597). A genuinely hot key needs pre-salting
        // (Skew.saltedGroupCount) before juice, exactly as it would
        // need manual splitting in the reference.
        (k, vs.iterator)
      }
    }
}
