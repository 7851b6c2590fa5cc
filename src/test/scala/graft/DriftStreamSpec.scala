package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.streaming.EventStream

/** Pins [[EventStream.driftStream]] to its batch twin
  * [[Similarity.assignmentDrift]] (the EventStream twin discipline):
  * the stream-accumulated profile must equal the batch profile on the
  * same slice bit-for-bit, and the new-modes scenario — the one
  * RECALL.json measured cratering recall — must flag within ONE
  * micro-batch of an unseen-mode vector arriving. Also pins the batch
  * monitor over the REAL append store (the q_ann_ivf_append layout):
  * profiling a store-read slice equals profiling the in-memory slice,
  * so the drift gate and the maintenance path it guards are verified
  * against the same bytes. */
class DriftStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // the DriftSpec corpus: 8 crisp modes, label = id % 8, so even ids
  // cover ONLY the even modes
  private lazy val corpus = RecallBench.clusteredEmbeddings(
    spark, n = 800, dim = 16, nCenters = 8, noise = 0.05, seed = 99L)
    .persist()

  /** Latest accumulated row per cluster (max upd) from the update-mode
    * memory sink, shaped like the batch profile for comparison. */
  private def latest(table: String): Map[Int, (Long, Long, Option[Double],
      Option[Double], Option[Double], Int)] =
    spark.table(table).collect()
      .groupBy(_.getAs[Int]("cluster"))
      .map { case (c, rows) =>
        val r = rows.maxBy(_.getAs[Long]("upd"))
        c -> (r.getAs[Long]("n_base"), r.getAs[Long]("n_new"),
          Option(r.getAs[java.lang.Double]("mean_d2_base")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("mean_d2_new")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("drift_ratio")).map(_.doubleValue),
          r.getAs[Int]("drift_flag"))
      }

  private def batchProfile(base: org.apache.spark.sql.DataFrame,
                           appended: org.apache.spark.sql.DataFrame,
                           centroids: IndexedSeq[IndexedSeq[Double]]) =
    Similarity.assignmentDrift(base, appended, "embedding", centroids)
      .filter(col("n_new") > 0).collect()
      .map { r =>
        r.getAs[Int]("cluster") -> (r.getAs[Long]("n_base"),
          r.getAs[Long]("n_new"),
          Option(r.getAs[java.lang.Double]("mean_d2_base")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("mean_d2_new")).map(_.doubleValue),
          Option(r.getAs[java.lang.Double]("drift_ratio")).map(_.doubleValue),
          r.getAs[Int]("drift_flag"))
      }.toMap

  test("stream-accumulated profile equals batch assignmentDrift; new modes flag in their first batch") {
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val appended = corpus.filter(col("vec_id") % 2 === 1)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 4, iters = 8, seed = 7L)
    val dir = Files.createTempDirectory("graft-drift-stream").toString
    // batch 1: half the appended slice — already all unseen modes
    appended.filter(col("vec_id") % 4 === 1)
      .write.mode("append").parquet(dir)
    val q = EventStream.driftStream(spark, dir, base, "embedding",
        km.centroids)
      .writeStream.outputMode("update").format("memory")
      .queryName("drift_stream_out").start()
    try {
      q.processAllAvailable()
      val afterFirst = latest("drift_stream_out")
      assert(afterFirst.nonEmpty, "first batch must emit profile rows")
      assert(afterFirst.values.exists(_._6 == 1),
        s"unseen modes must flag within their first batch: $afterFirst")
      // batch 2: the rest of the slice — the accumulated profile must
      // now equal the batch operator over the FULL slice
      appended.filter(col("vec_id") % 4 === 3)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = latest("drift_stream_out")
    val batch = batchProfile(base, appended, km.centroids)
    assert(streamed === batch,
      s"stream-accumulated profile must equal batch:\n$streamed\nvs\n$batch")
  }

  test("in-distribution feed: stream matches batch and never flags") {
    // base = ids not-2-mod-3 samples EVERY mode (3 coprime to 8)
    val base = corpus.filter(col("vec_id") % 3 < 2)
    val appended = corpus.filter(col("vec_id") % 3 === 2)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 8, iters = 8, seed = 7L)
    val dir = Files.createTempDirectory("graft-drift-stream2").toString
    appended.write.mode("append").parquet(dir)
    val q = EventStream.driftStream(spark, dir, base, "embedding",
        km.centroids)
      .writeStream.outputMode("update").format("memory")
      .queryName("drift_stream_out2").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = latest("drift_stream_out2")
    assert(streamed === batchProfile(base, appended, km.centroids))
    assert(streamed.values.forall(_._6 == 0),
      s"in-distribution growth must not flag: $streamed")
  }

  test("drift profile over the real append store matches the in-memory profile") {
    // the q_ann_ivf_append layout end-to-end: fit + store the even
    // half partitioned by cluster, append the odd half via the
    // no-refit map-side assignment, then profile the STORE-READ
    // slices — the drift monitor and the maintenance path it guards,
    // verified against the same bytes
    // parquet round trip first: the in-memory mixture corpus carries
    // containsNull=false element nullability, which the store read-back
    // (correctly) widens — the append layout check compares read-back
    // types, so feed it the same parquet-shaped frame production would
    val corpusDir = Files.createTempDirectory("graft-drift-corpus").toString
    corpus.write.mode("overwrite").parquet(corpusDir)
    val corpusP = spark.read.parquet(corpusDir)
    val base = corpusP.filter(col("vec_id") % 2 === 0)
    val appended = corpusP.filter(col("vec_id") % 2 === 1)
    val km = Similarity.kMeans(base, "vec_id", "embedding",
      k = 4, iters = 8, seed = 7L)
    val root = Files.createTempDirectory("graft-drift-store").toString
    val cat = new graft.catalog.Catalog(spark, root)
    cat.putPartitioned("drift_store",
      base.join(km.assignments, "vec_id"), "cluster")
    cat.appendPartitioned("drift_store",
      Similarity.assignedToCentroids(appended, "embedding", km.centroids),
      "cluster")
    val stored = cat.get("drift_store")
    val fromStore = Similarity.assignmentDrift(
        stored.filter(col("vec_id") % 2 === 0),
        stored.filter(col("vec_id") % 2 === 1),
        "embedding", km.centroids)
      .collect().map(_.toString).sorted
    val inMemory = Similarity.assignmentDrift(base, appended,
        "embedding", km.centroids)
      .collect().map(_.toString).sorted
    assert(fromStore === inMemory,
      "store-read drift profile must equal the in-memory profile")
    cat.close()
  }
}
