package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the `events` table shape: tumbling-window
  * aggregation with a watermark for late data, plus the identical
  * batch formulation (same column expressions) so stream and batch
  * results can be compared row-for-row.
  *
  * Streams are beyond-reference (SURVEY.md §2.9: the reference is
  * batch-files-only); this is the readStream → watermark → window →
  * writeStream shape a user upgrading from the reference gets.
  */
object EventStream {

  /** Shared aggregation: hourly tumbling window per event_type. */
  private def windowed(df: DataFrame): DataFrame =
    df.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").cast("long").as("hour_start"),
              col("event_type"), col("cnt"), col("sum_value"))

  /** Batch formulation (driver-checkable against DuckDB time_bucket). */
  def hourlyBatch(events: DataFrame): DataFrame = windowed(events)

  /** Streaming formulation over a parquet directory; 10-minute
    * watermark bounds state for late arrivals. */
  def hourlyStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    windowed(stream.withWatermark("ts", "10 minutes"))
  }

  /** Run the streaming query to completion over the (finite) input and
    * return the materialized result — used by tests to assert
    * stream == batch. `complete` output mode because the sink is the
    * in-memory table. */
  def runStreamToMemory(spark: SparkSession, dir: String,
                        name: String = "graft_stream_out"): DataFrame = {
    val q = hourlyStream(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
