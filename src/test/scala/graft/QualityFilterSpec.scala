package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** The distribution-derived quality gate: exact form is pinned by the
  * q_quality_filter oracle; this spec pins the approx_percentile scale
  * path against it. */
class QualityFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("approx quality gate keeps nearly the same set as the exact gate") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val exact = TextAnalysis.qualityFilter(docs, "text", q = 0.75)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val approx = TextAnalysis.qualityFilter(docs, "text", q = 0.75,
        approxAccuracy = 10000)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty)
    // at accuracy 10000 on a few thousand rows the sketch's rank error
    // is at most a handful of docs around the threshold
    val sym = (exact diff approx) ++ (approx diff exact)
    assert(sym.size <= math.max(2, exact.size / 20),
      s"approx gate diverged: |exact|=${exact.size} |approx|=${approx.size} " +
        s"symdiff=${sym.size}")
  }
}
