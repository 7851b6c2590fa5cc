package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for the bench's suspect-re-run policy ([[BenchHistory]])
  * — the self-healing path only fires on genuinely contaminated
  * hosts, so the policy is verified here on staged inputs instead of
  * hoping a real burst exercises it. */
class BenchHistorySpec extends AnyFunSuite {

  private val line =
    """{"at":"x","out":"BENCH_FULL.json","bench":{"metric":"total","value":10.0,""" +
      """"sf":"/root/testdata/sf0.1","queries":{"q_a":0.50,"q_b":2.00,"q_err":-1},""" +
      """"queries_min":{"q_a":0.40,"q_b":1.50,"q_err":-1},"errors":[]}}"""

  test("extractNumObj parses flat numeric objects, drops -1 markers, survives truncation") {
    assert(BenchHistory.extractNumObj(line, "queries_min") ===
      Map("q_a" -> 0.40, "q_b" -> 1.50))
    assert(BenchHistory.extractNumObj(line, "queries") ===
      Map("q_a" -> 0.50, "q_b" -> 2.00))
    assert(BenchHistory.extractNumObj(line, "absent") === Map.empty)
    // a driver-tail truncation tearing the object mid-brace yields
    // nothing rather than throwing
    val torn = line.take(line.indexOf("\"q_b\":1.50"))
    assert(BenchHistory.extractNumObj(torn, "queries_min") === Map.empty)
    assert(BenchHistory.extractNumObj("", "queries") === Map.empty)
  }

  test("healthyMins folds the all-time min per query, filtered to the same sf") {
    val older = line.replace("\"q_a\":0.40", "\"q_a\":0.30")
    val otherSf = line.replace("/root/testdata/sf0.1", "/root/testdata/sf0.001")
      .replace("\"q_a\":0.40", "\"q_a\":0.01")
    val mins = BenchHistory.healthyMins(Seq(line, older, otherSf),
      "/root/testdata/sf0.1")
    assert(mins === Map("q_a" -> 0.30, "q_b" -> 1.50),
      "min over same-sf lines only; the other-sf 0.01 must not leak in")
    // pre-r17 lines without queries_min fall back to medians
    val legacy = """{"sf":"/root/testdata/sf0.1","queries":{"q_c":0.70}}"""
    assert(BenchHistory.healthyMins(Seq(legacy), "/root/testdata/sf0.1") ===
      Map("q_c" -> 0.70))
  }

  test("heal compares medians (what ships) — a heal can never increase the median") {
    // the r18 live inversion: rerun min 4.63 < orig min 5.07, but the
    // shipped MEDIAN would have gone 5.43 -> 7.37; the median rule
    // must refuse this exact run-set
    val orig = Seq(5.07, 5.43, 5.03)
    val rerun = Seq(4.63, 7.37, 15.17)
    assert(!BenchHistory.healed(orig, rerun),
      "a rerun with a lower min but a worse median must NOT replace the runs")
    // a genuinely clean re-run (lower median) does heal
    assert(BenchHistory.healed(orig, Seq(0.40, 0.36, 0.38)))
    // ties keep the original (strict <): replacing on equal medians
    // would churn artifacts for nothing
    assert(!BenchHistory.healed(Seq(1.0, 2.0, 3.0), Seq(2.0, 0.5, 9.9)))
    // empty sides never heal
    assert(!BenchHistory.healed(orig, Seq.empty))
    // the general invariant on a sweep of staged run-sets: whatever
    // the policy picks, the shipped median never exceeds the original
    val sets = Seq(
      Seq(1.0) -> Seq(0.5), Seq(1.0) -> Seq(2.0),
      Seq(3.0, 1.0, 2.0) -> Seq(0.1, 9.0, 0.2),
      orig -> rerun, rerun -> orig)
    sets.foreach { case (o, r) =>
      val shipped = if (BenchHistory.healed(o, r)) r else o
      assert(BenchHistory.median(shipped) <= BenchHistory.median(o),
        s"heal raised the median on $o vs $r")
    }
  }

  test("suspects: 3x-over-history AND absolute floor; errors and unknowns never re-run") {
    val history = Map("q_a" -> 0.10, "q_b" -> 1.00, "q_tiny" -> 0.02)
    val results = Seq(
      "q_a" -> Seq(0.50, 0.55, 0.60),    // min 0.50 > 3*0.10 and +0.40 -> suspect
      "q_b" -> Seq(1.10, 1.20, 1.30),    // min 1.10 < 3*1.00 -> clean
      "q_tiny" -> Seq(0.08, 0.09, 0.10), // 4x history but only +0.06 -> under floor
      "q_new" -> Seq(9.99),              // no history -> cannot judge
      "q_err" -> Seq(-1.0))              // failed -> never re-run
    assert(BenchHistory.suspects(results, history) === Seq("q_a"))
    // the floor is a parameter: lowering it admits the tiny query
    assert(BenchHistory.suspects(results, history, floorSec = 0.01) ===
      Seq("q_a", "q_tiny"))
    // the cap bounds a globally-slow host
    val many = (1 to 40).map(i => s"q_$i" -> Seq(1.0))
    val allSlow = many.map(_._1).map(_ -> 0.1).toMap
    assert(BenchHistory.suspects(many, allSlow).size === 16)
  }
}
