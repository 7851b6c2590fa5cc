package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** [[RangeJoin.pointsInIntervals]] — binned interval-containment
  * join: exact equality against the brute-force non-equi join across
  * bin widths (the binning must be invisible in the result), edge
  * semantics (inclusive bounds, inverted/null intervals, negative
  * values across bin boundaries), and the plan shape the operator
  * exists for (hash equi-join on the bin, no nested-loop scan of all
  * pairs). */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def brute(points: Seq[Long], ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      p <- points
      (id, lo, hi) <- ivs
      if lo <= p && p <= hi
    } yield (p, id)).toSet

  private def binned(points: Seq[Long], ivs: Seq[(Long, Long, Long)],
                     w: Long): Set[(Long, Long)] = {
    val s = spark
    import s.implicits._
    RangeJoin.pointsInIntervals(
        points.toDF("p"), "p",
        ivs.toDF("iv_id", "lo", "hi"), "lo", "hi", w)
      .select("p", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("equals the brute-force containment join across bin widths (seeded fuzz)") {
    val rnd = new scala.util.Random(424242)
    val points = Seq.fill(400)(rnd.nextInt(2000).toLong - 500) // negatives included
    val ivs = (1L to 80L).map { id =>
      val lo = rnd.nextInt(2000).toLong - 500
      (id, lo, lo + rnd.nextInt(120))
    }
    val truth = brute(points, ivs)
    assert(truth.nonEmpty, "fuzz setup must produce matches")
    for (w <- Seq(1L, 7L, 64L, 1000L))
      assert(binned(points, ivs, w) === truth, s"binWidth=$w")
  }

  test("bounds are inclusive on both ends; inverted and null intervals match nothing") {
    val s = spark
    import s.implicits._
    val pts = Seq(5L, 10L, 15L).toDF("p")
    val ivs = Seq(
      (1L, Some(5L), Some(10L)),   // matches 5 and 10 (inclusive)
      (2L, Some(12L), Some(11L)),  // inverted: nothing
      (3L, None, Some(20L)),       // null lo: nothing
    ).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointsInIntervals(pts, "p", ivs, "lo", "hi", 7L)
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((5L, 1L), (10L, 1L)))
  }

  test("each matching pair appears exactly once even when an interval spans many bins") {
    val s = spark
    import s.implicits._
    val pts = Seq(50L).toDF("p")
    val ivs = Seq((1L, 0L, 100L)).toDF("iv_id", "lo", "hi") // 101 bins at w=1
    val rows = RangeJoin.pointsInIntervals(pts, "p", ivs, "lo", "hi", 1L).collect()
    assert(rows.length === 1, "a pair must meet in exactly one bin — the point's")
  }

  test("shared column names are rejected up front") {
    val s = spark
    import s.implicits._
    intercept[IllegalArgumentException] {
      RangeJoin.pointsInIntervals(Seq(1L).toDF("x"), "x",
        Seq((1L, 2L)).toDF("x", "hi"), "x", "hi", 1L)
    }
  }

  test("intervalsOverlap equals the brute-force overlap join, exactly once per pair") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(777)
    val as = (1L to 60L).map { id =>
      val lo = rnd.nextInt(1000).toLong; (id, lo, lo + rnd.nextInt(90)) }
    val bs = (1L to 70L).map { id =>
      val lo = rnd.nextInt(1000).toLong; (id, lo, lo + rnd.nextInt(90)) }
    val truth = (for {
      (ai, alo, ahi) <- as
      (bi, blo, bhi) <- bs
      if alo <= bhi && blo <= ahi
    } yield (ai, bi)).toSet
    assert(truth.nonEmpty)
    for (w <- Seq(1L, 13L, 200L)) {
      val rows = graft.operators.RangeJoin.intervalsOverlap(
          as.toDF("a_id", "a_lo", "a_hi"), "a_lo", "a_hi",
          bs.toDF("b_id", "b_lo", "b_hi"), "b_lo", "b_hi", w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length === rows.toSet.size,
        s"binWidth=$w emitted duplicate pairs — the later-start tie-break failed")
      assert(rows.toSet === truth, s"binWidth=$w")
    }
  }

  test("plan is a hash equi-join on the bin — never a nested-loop over all pairs") {
    val s = spark
    import s.implicits._
    val pts = (1L to 1000L).toDF("p")
    val ivs = (1L to 200L).map(i => (i, i * 3, i * 3 + 40)).toDF("iv_id", "lo", "hi")
    val p = RangeJoin.pointsInIntervals(pts, "p", ivs, "lo", "hi", 32L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to an all-pairs scan:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"bin key is not driving a hash/merge equi-join:\n$p")
  }
}
