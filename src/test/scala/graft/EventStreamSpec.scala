package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("streaming dedup with watermark equals batch dropDuplicates on finite input") {
    val dir = Files.createTempDirectory("graft-sdedup").toString
    val events = Tables.events(spark, SparkSuite.sf0001)
    // plant exact duplicates
    events.unionAll(events.limit(50)).write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
      .dropDuplicates(Seq("user_id", "event_type", "ts"))
      .count()
    val q = EventStream.dedupStream(spark, dir, Seq("user_id", "event_type"), "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sdedup").start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.table("graft_sdedup").count() === batch)
  }

  test("streaming simhash near-dup equals batch pairs, including across batches") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sneardup").toString
    val docs = Tables.documents(spark, SparkSuite.sf0001)
      .select(col("doc_id"), col("text"),
        expr("timestamp_seconds(1700000000 + doc_id)").as("ts"))
    // feed in two event-time-ordered batches so state genuinely
    // crosses a batch boundary
    docs.filter(col("doc_id") < 250).write.mode("overwrite").parquet(dir)
    val q = EventStream.nearDupStream(spark, dir, "doc_id", "text", "ts",
        maxHamming = 3, delay = "1 second")
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sneardup").start()
    try {
      q.processAllAvailable()
      docs.filter(col("doc_id") >= 250).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_sneardup")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    // batch truth: for every doc_b its smallest matched earlier doc_a
    // (ts order == id order here)
    val batch = graft.operators.Dedup
      .simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .groupBy(_._2).map { case (b, ps) => b -> ps.map(_._1).min }
    assert(batch.nonEmpty, "test data must contain simhash near-dups")
    assert(streamed === batch)
  }

  test("nearDupStream overflow bucket: caps matching, then reopens after horizon aging") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sneardup-cap").toString
    val t0 = 1700000000L
    import spark.implicits._
    def write(ids: Seq[Long], off: Long => Long, mode: String): Unit =
      ids.map(i => (i, off(i))).toDF("doc_id", "tsoff")
        .withColumn("text", lit("the quick brown fox jumps over the lazy dog"))
        .withColumn("ts", expr(s"timestamp_seconds($t0 + tsoff)"))
        .drop("tsoff")
        .write.mode(mode).parquet(dir)
    // batch 1: five identical docs, cap is 4 — doc 4 must be dropped
    write(Seq(0L, 1L, 2L, 3L, 4L), i => i, "overwrite")
    val q = EventStream.nearDupStream(spark, dir, "doc_id", "text", "ts",
        maxHamming = 3, delay = "1 second", horizonMs = 10000L, maxBucket = 4)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sneardup_cap").start()
    try {
      q.processAllAvailable()
      // batch 2: bucket still full (state within horizon) — dropped too
      write(Seq(10L, 11L), _ => 100L, "append")
      q.processAllAvailable()
      // batch 3: watermark now ~t0+99s, batch-1 state aged out (>10s
      // horizon) and batch-2 docs were never admitted — bucket reopens
      // empty, doc 20 is admitted with no earlier match
      write(Seq(20L), _ => 102L, "append")
      q.processAllAvailable()
      // batch 4: doc 21 matches the re-admitted doc 20
      write(Seq(21L), _ => 103L, "append")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("graft_sneardup_cap")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dup_of")).toMap
    // first maxBucket arrivals pair normally; overflow (4, 10, 11) is
    // dropped — the documented divergence from batch, which would have
    // suppressed the whole bucket; post-aging the bucket matches again
    assert(streamed === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 21L -> 20L))
  }

  test("streaming hourly aggregation equals the batch formulation") {
    // stage events as micro-precision parquet (streaming source can't
    // read the nanos-typed original)
    val dir = Files.createTempDirectory("graft-stream").toString
    val events = Tables.events(spark, SparkSuite.sf0001)
    events.write.mode("overwrite").parquet(dir)

    val batch = EventStream.hourlyBatch(spark.read.parquet(dir))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val stream = EventStream.runStreamToMemory(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("streaming as-of enrichment equals the batch as-of join on finite input") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft-sasof").toString
    Tables.events(spark, SparkSuite.sf0001).write.mode("overwrite").parquet(dir)

    val ev = spark.read.parquet(dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), unix_micros(col("ts")).as("pts_us"),
        col("value"))
      .withColumnRenamed("p_user", "user_id")
    val batch = graft.operators.AsOfJoin
      .asOf(clicks, purchases, "user_id", "ts_us", "pts_us", Seq("value"))
      .select(col("event_id"),
        coalesce(col("asof_ts"), lit(-1L)).as("ats"),
        coalesce(col("asof_value"), lit(-1.0)).as("av"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val q = EventStream.asOfStream(spark, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("graft_sasof").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("graft_sasof")
      .select(col("event_id"), col("asof_ts_us"), col("asof_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    assert(streamed === batch)
    assert(streamed.exists(_._2 == -1L), "expected some no-match rows")
    assert(streamed.exists(_._2 != -1L), "expected some enriched rows")
  }
}
