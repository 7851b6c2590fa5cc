package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Interleaved A/B of the near-dup queries with and without the
  * minhash-estimate candidate pre-filter. Dev tool:
  * `runMain graft.NgramBench [sfDir] [char|word]`.
  */
object NgramBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val variant = args.lift(1).getOrElse("char")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    val (shingler, k) =
      if (variant == "word") (Dedup.shingleHashes("text", 3), 64)
      else (Dedup.charShingleHashes("text", 5), 32)

    def time(label: String, estMargin: Double): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val sigs = Dedup.signatures(docs, "doc_id", shingler, k, seed = 42L)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = Dedup.candidateIdPairs(Dedup.bandRows(sigs, 16, k / 16))
      val n = Dedup.verifyJaccard(pairs, sigs, 0.8, estMargin).count()
      println(f"$label%-18s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n pairs)")
    }
    for (trial <- 1 to 3) {
      println(s"--- trial $trial")
      time("no-prefilter", estMargin = 2.0)  // est filter always passes
      time("est-prefilter", estMargin = 0.25)
    }
    spark.stop()
  }
}
