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

  test("suspects: a poisoned MEDIAN with a clean min IS a suspect (r20 driver window)") {
    // q_dsir_sample ran [2.0, 37.3, 48.6] on the r20 driver host: the
    // 2.0 s min was within 3x of healthy (the min rule exonerated it)
    // while the SHIPPED median, 37.3 s, was ~30x the healthy median.
    val mins = Map("q_dsir_sample" -> 1.1, "q_clean" -> 1.0)
    val medians = Map("q_dsir_sample" -> 1.25, "q_clean" -> 1.2)
    val results = Seq(
      "q_dsir_sample" -> Seq(2.0, 37.3, 48.6), // clean min, poisoned median
      "q_clean" -> Seq(1.1, 1.2, 1.3))
    assert(BenchHistory.suspects(results, mins, medians) === Seq("q_dsir_sample"))
    // with NO median history the min rule alone still exonerates it —
    // the pre-fix behavior, kept for pre-r21 history lines
    assert(BenchHistory.suspects(results, mins) === Seq.empty)
  }

  test("suspects: the requeue cap is spent by severity, not alphabetically") {
    // 16 mild suspects with alphabetically-early names plus two severe
    // ones late in the alphabet — the r20 failure shape. The cap must
    // keep the severe pair and drop the two mildest, not truncate at
    // the 16th name.
    val mild = (1 to 16).map(i => f"q_a$i%02d" -> Seq(0.5, 0.55, 0.6))
    val severe = Seq(
      "q_z_dsir" -> Seq(35.0, 37.3, 48.6),
      "q_z_kmv" -> Seq(15.0, 17.1, 28.5))
    val hist = (mild.map(_._1) ++ severe.map(_._1)).map(_ -> 0.1).toMap
    val picked = BenchHistory.suspects(mild ++ severe, hist, hist)
    assert(picked.size === 16)
    assert(picked.take(2) === Seq("q_z_dsir", "q_z_kmv"),
      "the worst offenders must head the requeue list")
    assert(!picked.contains("q_a15") && !picked.contains("q_a16"),
      "the mildest suspects are the ones the cap drops")
  }

  test("healthyMedians folds the all-time min of shipped medians, same-sf only") {
    val older = line.replace("\"q_a\":0.50", "\"q_a\":0.45")
    val otherSf = line.replace("/root/testdata/sf0.1", "/root/testdata/sf0.001")
      .replace("\"q_a\":0.50", "\"q_a\":0.01")
    assert(BenchHistory.healthyMedians(Seq(line, older, otherSf),
      "/root/testdata/sf0.1") === Map("q_a" -> 0.45, "q_b" -> 2.00))
  }
}
