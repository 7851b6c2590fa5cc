package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Interleaved A/B of the minhash formulations (native codegen'd
  * expression vs interpreted k-pass transform vs single-pass fold)
  * over the char-gram universe — the dominant cost of q_dedup_ngram.
  * Interleaved so host-throughput drift can't masquerade as a win;
  * identical checksums across variants double as an equality check.
  * Dev tool: `runMain graft.MinhashBench [sfDir]`.
  */
object MinhashBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.MinHashSignature.register(spark)
    val docs = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id"), Dedup.charShingleHashes("text", 5).as("h"))
      .persist()
    docs.count() // materialize gram arrays off the clock

    def time(label: String)(mk: => org.apache.spark.sql.Column): Unit = {
      val t0 = System.nanoTime()
      val n = docs.select(xxhash64(mk.cast("string")).as("sig"))
        .agg(expr("bit_xor(sig)")).head().getLong(0)
      println(f"$label%-14s ${(System.nanoTime() - t0) / 1e9}%8.2f s  (checksum $n)")
    }
    for (trial <- 1 to 3) {
      println(s"--- trial $trial")
      time("hof-k-pass")(Dedup.minhashSignatureHof("h", 32))
      time("native")(Dedup.minhashSignature("h", 32))
      time("single-pass")(Dedup.minhashSignatureSinglePass("h", 32))
    }
    docs.unpersist()
    spark.stop()
  }
}
