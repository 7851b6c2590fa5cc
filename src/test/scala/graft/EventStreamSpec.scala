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
}
