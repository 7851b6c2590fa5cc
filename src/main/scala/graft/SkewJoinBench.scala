package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Skewed-join A/B: [[graft.operators.Skew.saltedJoin]] vs the plain
  * shuffle join under AQE, on a hot-key input (90% of the big side on
  * one key, ~8M rows, the small side forced past broadcast by
  * `autoBroadcastJoinThreshold=-1` — a broadcastable dim table has no
  * skew problem at all, the hot key never concentrates).
  *
  * Three arms, interleaved:
  *  - plain/default: AQE skew-join is ON but its split trigger
  *    (`skewedPartitionThresholdInBytes`, default 256 MB) is far above
  *    this hot partition, so the rule never fires and the hot key
  *    funnels through one sort-merge task — the untuned baseline.
  *  - plain/tuned: same join with the threshold lowered to 8 MB, the
  *    tuning a 100 TB deployment would ship — AQE splits the skewed
  *    partition at runtime.
  *  - salted: explicit shuffle-time spread, no AQE dependence.
  *
  * Run: sbt 'runMain graft.SkewJoinBench'
  * Measured numbers are recorded in README ("Measured notes") and in
  * saltedJoin's scaladoc.
  */
object SkewJoinBench {
  def main(args: Array[String]): Unit = {
    val cpus = math.min(32, Runtime.getRuntime.availableProcessors())
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.get("SPARK_GRAFT_JOIN_ROWS").flatMap(_.toLongOption)
      .getOrElse(8000000L)

    // 90% of big lands on key 0; the tail spreads over 1M keys. The
    // payload column varies per row, so the full-row default salt
    // basis spreads the hot key.
    val big = spark.range(n).select(
        when(pmod(col("id"), lit(10)) < 9, lit(0L))
          .otherwise(pmod(xxhash64(col("id")), lit(1000000L))).as("k"),
        col("id").as("payload"))
      .persist() // bench-owned: lives for the run, dies with the JVM
    big.count()
    val med = spark.range(1000000L).select(col("id").as("k"),
        concat(lit("dim"), col("id")).as("name"))
      .persist() // bench-owned
    med.count()

    val thresholdKey = "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
    val factorKey = "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    val savedThreshold = spark.conf.get(thresholdKey)
    val savedFactor = spark.conf.get(factorKey)

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = f
      ((System.nanoTime() - t0) / 1e9, c)
    }
    def plainCount(): Long = big.join(med, "k").count()

    // equality: all three arms must agree before timing means anything
    val expected = plainCount()
    val saltedCount = Skew.saltedJoin(big, med, "k", saltFactor = 16).count()
    require(saltedCount == expected, s"salted=$saltedCount plain=$expected")
    println(s"rows=$n joined=$expected hot-key share=90% — results identical")

    for (trial <- 1 to 3) {
      val (tDefault, _) = timed(plainCount())
      val (tSalted, _) = timed(
        Skew.saltedJoin(big, med, "k", saltFactor = 16).count())
      spark.conf.set(thresholdKey, "8MB")
      spark.conf.set(factorKey, "2")
      val (tTuned, _) = try timed(plainCount()) finally {
        spark.conf.set(thresholdKey, savedThreshold)
        spark.conf.set(factorKey, savedFactor)
      }
      println(f"trial $trial: plain/default $tDefault%7.2f s   " +
        f"plain/tuned-AQE $tTuned%7.2f s   salted $tSalted%7.2f s")
    }
    spark.stop()
  }
}
