package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Interleaved A/B harness for the near-dup hot paths. This VM's
  * throughput swings 2-4× between runs, so configurations are only
  * comparable when interleaved inside one JVM. Dev tool:
  * `runMain graft.NgramBench [sfDir] [char|word|simhash]`.
  *
  *  - char/word: banding trade for the LSH pipeline — k=32 in 16
  *    bands (r=2, more false candidates, cheaper signatures) vs k=64
  *    in 16 bands (r=4, sharper S-curve) — and the minhash-estimate
  *    pre-filter on/off at the chosen production k.
  *  - simhash: the simhash near-dup pipeline alone (regression probe).
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

    def shingler = if (variant == "word") Dedup.shingleHashes("text", 3)
                   else Dedup.charShingleHashes("text", 5)

    def timeLsh(label: String, k: Int, bands: Int, estMargin: Double): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val sigs = Dedup.signatures(docs, "doc_id", shingler, k, seed = 42L)
        // bench-owned cache: dropped by the clearCache() at the top of
        // every timing, and the process exits after the trials
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // bandG cache dropped by the clearCache() like sigs above
      val (pairs, _) = Dedup.candidateIdPairs(Dedup.bandRows(sigs, bands, k / bands))
      val n = Dedup.verifyJaccard(pairs, sigs, 0.8, estMargin).count()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n pairs)")
    }
    def timeSimhash(label: String): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = Dedup.simhashNearDups(docs, "doc_id", "text").count()
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n pairs)")
    }

    for (trial <- 1 to 3) {
      println(s"--- trial $trial")
      if (variant == "simhash") timeSimhash("simhash")
      else {
        timeLsh("k32-b16-r2", 32, 16, estMargin = 0.25)
        timeLsh("k64-b16-r4", 64, 16, estMargin = 0.25)
        timeLsh("k32-b16-no-prefilter", 32, 16, estMargin = 2.0)
      }
    }
    spark.stop()
  }
}
