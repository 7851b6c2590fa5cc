package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Components, Dedup}

/** The bench's q_dedup_bundle override claims the bundle amortizes pair
  * generation: three consuming actions for ≈ the cost of ONE
  * cluster pass, not three. Round 12 shipped the claim as prose (the
  * driver's truncated bench tail hid both numbers); this pins it as a
  * checked invariant. The assertion is deliberately generous (< 2× a
  * single pass, where a broken bundle that re-ran pair generation per
  * consumer would sit near 3×) so host noise cannot flake it while the
  * regression it guards cannot slip under it. */
class DedupBundleSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  test("bundle's three consumers cost < 2x one cluster pass (amortized pair set)") {
    val docs = Tables.documents(spark, SparkSuite.sf001)
    def pairs() = Dedup.exactJaccardPairs(docs, "doc_id", "text", threshold = 0.8)

    // warm the parquet footers / codegen paths off the clock
    docs.count()

    // single pass: pair generation + one clustering action
    val single = timed {
      Components.clusters(docs, "doc_id", pairs()).count()
    }

    // production bundle: ONE pair materialization, three consumers
    val bundleSec = timed {
      val b = Dedup.bundle(docs, "doc_id", pairs())
      b.clusters.count()
      b.canonical.count()
      b.deduped.count()
      b.release()
    }
    spark.catalog.clearCache()

    info(f"single cluster pass: $single%.2fs, bundle (3 actions): $bundleSec%.2fs, " +
      f"ratio ${bundleSec / single}%.2f")
    assert(bundleSec < 2 * single,
      f"bundle (3 consumers) took $bundleSec%.2fs vs single pass $single%.2fs — " +
        "amortization broken (pair generation re-running per consumer?)")
  }
}
