package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One event for stateful sessionization (ms since epoch). */
case class SessEvent(user_id: Long, ts_ms: Long)

/** One emitted session summary. */
case class Session(user_id: Long, session_id: Long, cnt: Long,
                   start_ms: Long, end_ms: Long)

/** Gap-based sessionization of an event stream: a new session starts
  * when a user is idle longer than `gapMs`.
  *
  * Batch formulation is pure window algebra (lag → gap flag →
  * running sum = session id), one shuffle on user_id — and is the
  * oracle for the streaming formulation in
  * [[graft.streaming.EventStream.sessionizeStream]].
  */
object Sessionize {

  val DefaultGapMs: Long = 30 * 60 * 1000L

  /** Batch: session summaries per (user, session ordinal). */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
               gapMs: Long = DefaultGapMs): DataFrame = {
    // partition on the post-select alias, not userCol — the select
    // below renames the user column to "user_id"
    val byTime = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"))
    events
      .select(col(userCol).as("user_id"), unix_millis(col(tsCol)).as("ts_ms"))
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(byTime))
      .withColumn("new_session",
        when(col("prev_ms").isNull || col("ts_ms") - col("prev_ms") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("cnt"),
           min(col("ts_ms")).as("start_ms"),
           max(col("ts_ms")).as("end_ms"))
  }

  /** Per-user in-memory sessionization of a time-sorted event list —
    * shared by the streaming stateful operator and its tests. */
  private[graft] def sessionizeSorted(userId: Long, sorted: Seq[Long],
                                      gapMs: Long): Seq[Session] = {
    if (sorted.isEmpty) Seq.empty
    else {
      var sessions = Vector.empty[Session]
      var sid = 1L
      var start = sorted.head
      var last = sorted.head
      var cnt = 1L
      sorted.tail.foreach { t =>
        if (t - last > gapMs) {
          sessions :+= Session(userId, sid, cnt, start, last)
          sid += 1; start = t; cnt = 1L
        } else cnt += 1
        last = t
      }
      sessions :+ Session(userId, sid, cnt, start, last)
    }
  }
}
