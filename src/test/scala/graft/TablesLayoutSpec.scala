package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.parquet.schema.Types
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the events.parquet physical-layout contract: the driver has
  * regenerated `ts` as INT64 TIMESTAMP(NANOS) in early rounds and
  * TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ) in round 12, and each
  * drift broke the event queries at the driver gate. This spec writes
  * one tiny fixture per physical layout with identical instants and
  * asserts [[Tables.events]] yields the same microsecond timestamps
  * from all of them — so the NEXT regeneration (millis, adjusted-UTC
  * micros, back to nanos) fails here in `sbt test` first.
  */
class TablesLayoutSpec extends AnyFunSuite {
  private val spark = SparkSuite.spark

  // distinct instants incl. a non-zero sub-second part
  private val micros = Seq(1700000000000000L, 1700000001234567L, 1700003600999999L)

  /** Writes events.parquet with `ts` as INT64 timestamp of the given
    * unit/adjustment via the low-level parquet-hadoop writer (Spark
    * itself cannot emit TIMESTAMP(NANOS), which is the point: the
    * fixture mimics the driver's generator, not our own writer). */
  private def writeFixture(unit: TimeUnit, adjustedToUtc: Boolean, scale: Long): String = {
    val dir = Files.createTempDirectory("graft_layout_").toFile
    dir.deleteOnExit()
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(adjustedToUtc, unit))
      .named("ts")
      .named("events")
    val factory = new SimpleGroupFactory(schema)
    val w = ExampleParquetWriter
      .builder(new Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    try micros.zipWithIndex.foreach { case (us, i) =>
      val g = factory.newGroup()
      g.add("event_id", i.toLong)
      g.add("ts", us * scale)
      w.write(g)
    } finally w.close()
    dir.toString
  }

  private def loadedMicros(dir: String): Seq[(Long, Long)] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(col("event_id"), unix_micros(col("ts")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  test("nanos-as-long, micros-NTZ, and micros-UTC layouts all load to identical timestamps") {
    val nanosDir = writeFixture(TimeUnit.NANOS, adjustedToUtc = false, scale = 1000L)
    val ntzDir = writeFixture(TimeUnit.MICROS, adjustedToUtc = false, scale = 1L)
    val utcDir = writeFixture(TimeUnit.MICROS, adjustedToUtc = true, scale = 1L)

    val expected = micros.zipWithIndex.map { case (us, i) => (i.toLong, us) }.sorted
    assert(loadedMicros(nanosDir) == expected, "nanos fixture")
    assert(loadedMicros(ntzDir) == expected, "micros TIMESTAMP_NTZ fixture")
    assert(loadedMicros(utcDir) == expected, "micros adjusted-UTC fixture")
  }

  test("the real driver-generated events table loads with a TimestampType ts") {
    val df = Tables.events(spark, SparkSuite.sf0001)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.limit(1).count() == 1)
  }
}
