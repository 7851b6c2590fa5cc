package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

/** The three sliding gate oracles (q_event_sliding, q_event_kmv_sliding,
  * q_event_heavy_sliding) replay window membership as the EXPLICIT
  * arithmetic `(t_us div slide_us − j) · slide` for j < dur/slide,
  * and the streaming KMV/heavy-hitter paths key state by the same
  * expression — while the batch aggregates use Spark's NATIVE
  * `window(ts, dur, slide)`. This spec pins the equivalence those
  * oracles depend on, on seeded fuzz timestamps that include the
  * adversarial cases: exact slide boundaries, exact window ends,
  * one-microsecond offsets on both sides, and sub-second fractions.
  */
class SlidingWindowPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("explicit div-based membership == native window(dur, slide) on seeded fuzz (incl. boundaries)") {
    import spark.implicits._
    val durSec = 3600L
    val slideSec = 900L
    val n = durSec / slideSec
    val base = 1704067200L * 1000000L // 2024-01-01 00:00 UTC in µs
    val rnd = new scala.util.Random(4242)
    val fuzz = Seq.fill(3000)(base + (rnd.nextDouble() * 3 * 86400e6).toLong)
    // pre-1970 timestamps (negative unix_micros): truncating division
    // would assign these one slide late — membership must floor-align
    // exactly like native window() and DuckDB's `//` (round-17 ADVICE)
    val preEpoch = Seq.fill(500)(-(rnd.nextDouble() * 3 * 86400e6).toLong - 1)
    // boundary adversaries: slide-aligned, window-end-aligned, ±1 µs —
    // on BOTH sides of the epoch (k<0 exercises negative boundaries)
    val edges = (-11L to 10L).flatMap { k =>
      val b = base * (if (k < 0) 0 else 1) + k * slideSec * 1000000L
      Seq(b - 1, b, b + 1)
    }
    val rows = (fuzz ++ preEpoch ++ edges).zipWithIndex.map { case (us, i) => (i.toLong, us) }
    val df = rows.toDF("id", "ts_us")
      .select(col("id"), timestamp_micros(col("ts_us")).as("ts"))

    // native: every (id, window_start) Spark's sliding window assigns
    val native = df
      .groupBy(window(col("ts"), s"$durSec seconds", s"$slideSec seconds")
        .as("w"), col("id"))
      .count()
      .select(col("id"), col("w.start").cast("long").as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // explicit: THE OPERATOR'S OWN column (not a spec-local copy of
    // the arithmetic — a fix to one must be pinned against the other)
    val explicit = df
      .select(col("id"),
        EventStream.slidingStartsCol(durSec, slideSec).as("ws"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(explicit === native,
      s"membership diverged on ${(explicit diff native) ++ (native diff explicit)}")
    // every row lands in exactly dur/slide windows
    assert(native.size === rows.size * n.toInt)
  }

  test("a dur that does not divide by slide is rejected, not silently mis-assigned") {
    // membership would no longer be a constant dur/slide windows and
    // the last window would need a containment filter the explicit
    // arithmetic does not apply — the operators require instead
    val ev = Tables.events(spark, SparkSuite.sf0001)
    intercept[IllegalArgumentException] {
      EventStream.kmvWindowedBatch(ev, "cast(user_id as string)",
        windowSec = 3600L, k = 16, slideSec = 1000L)
    }
    intercept[IllegalArgumentException] {
      EventStream.heavyHittersWindowedBatch(ev, "cast(user_id as string)",
        support = 0.1, windowSec = 3600L, slideSec = 700L)
    }
  }
}
