package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStream

class EventStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

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
