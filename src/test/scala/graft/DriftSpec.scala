package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Pins [[Similarity.assignmentDrift]] to the RECALL.json append-sweep
  * scenario it operationalizes: no-refit append recall survives
  * in-distribution growth but craters when the appended slice carries
  * modes the base-fit quantizer never saw — so the drift profile must
  * flag exactly the new-mode case and stay quiet on the other. */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // 8-center mixture, low noise so mode separation is crisp; label
  // (= true mode) is id % 8, so even ids cover ONLY the even modes
  private lazy val corpus = RecallBench.clusteredEmbeddings(
    spark, n = 800, dim = 16, nCenters = 8, noise = 0.05, seed = 99L)
    .persist()

  test("in-distribution append: ratios near 1, zero flags") {
    // base = ids not-2-mod-3 samples EVERY mode (3 coprime to 8)
    val base = corpus.filter(col("vec_id") % 3 < 2)
    val appended = corpus.filter(col("vec_id") % 3 === 2)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 8, iters = 8, seed = 7L)
    val rows = Similarity.assignmentDrift(base, appended, "embedding",
        km.centroids).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getAs[Int]("drift_flag") === 0),
      s"in-distribution growth must not flag: ${rows.mkString(", ")}")
    rows.foreach { r =>
      val ratio = r.getAs[Double]("drift_ratio")
      assert(ratio > 0.5 && ratio < 2.0, s"ratio off on $r")
      assert(r.getAs[Long]("n_base") > 0 && r.getAs[Long]("n_new") > 0)
    }
  }

  test("new-mode append flags: unseen modes crowd old cells at inflated distance") {
    // base = even ids = even modes ONLY; the appended odd half is all
    // unseen modes — the quantizer (k = 4, matching the base's true
    // mode count) has no cells for them
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val appended = corpus.filter(col("vec_id") % 2 === 1)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 4, iters = 8, seed = 7L)
    val rows = Similarity.assignmentDrift(base, appended, "embedding",
        km.centroids).collect()
    val flagged = rows.filter(_.getAs[Int]("drift_flag") === 1)
    assert(flagged.nonEmpty,
      s"new-mode append must flag somewhere: ${rows.mkString(", ")}")
    // every flag is justified: empty base cell or ratio over threshold
    flagged.foreach { r =>
      val ok = r.getAs[Long]("n_base") == 0L ||
        r.getAs[Double]("drift_ratio") > 2.0
      assert(ok, s"unjustified flag: $r")
    }
    // and the inflation is real: appended mean distance far above base
    // in at least one flagged populated cell
    assert(flagged.exists(r => r.getAs[Long]("n_base") > 0 &&
      r.getAs[Double]("mean_d2_new") > 2.0 * r.getAs[Double]("mean_d2_base")),
      s"expected a populated cell with inflated appended distances: ${rows.mkString(", ")}")
  }

  test("empty sides and determinism under repartition") {
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 4, iters = 4, seed = 7L)
    // appended side empty: n_new = 0 everywhere, nothing flags
    val none = Similarity.assignmentDrift(base,
        corpus.filter(lit(false)), "embedding", km.centroids).collect()
    assert(none.forall(r => r.getAs[Long]("n_new") == 0L &&
      r.getAs[Int]("drift_flag") == 0))
    // a cluster absent from the BASE but receiving appended rows flags
    // (the brand-new-mode smoking gun): score against a centroid set
    // with one far-away fake cell no base vector wins
    val fake = km.centroids :+ IndexedSeq.fill(16)(100.0)
    val withFake = Similarity.assignmentDrift(base,
        corpus.filter(col("vec_id") % 2 === 1)
          .withColumn("embedding",
            expr("transform(embedding, x -> cast(100.0 as float))")),
        "embedding", fake).collect()
    val newCell = withFake.filter(r => r.getAs[Long]("n_base") == 0L &&
      r.getAs[Long]("n_new") > 0L)
    assert(newCell.nonEmpty && newCell.forall(_.getAs[Int]("drift_flag") == 1),
      s"empty-base cell with appended rows must flag: ${withFake.mkString(", ")}")
    // deterministic under repartition
    val a = Similarity.assignmentDrift(base,
        corpus.filter(col("vec_id") % 2 === 1), "embedding", km.centroids)
      .collect().map(_.toString).sorted
    val b = Similarity.assignmentDrift(base.repartition(7),
        corpus.filter(col("vec_id") % 2 === 1).repartition(5),
        "embedding", km.centroids)
      .collect().map(_.toString).sorted
    assert(a === b)
  }
}
