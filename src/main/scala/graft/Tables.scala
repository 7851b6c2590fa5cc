package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Helpers to load the driver-generated parquet tables
  * (see TESTDATA.md: region nation customer supplier part orders
  * lineitem events documents embeddings).
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** events.parquet's `ts` layout has drifted across regenerations
    * (INT64 TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), so adapt to the
    * loaded column's type instead of assuming one physical layout.
    * Every branch normalizes to microsecond-precision TimestampType
    * under the UTC session timezone all entry points pin
    * (TablesLayoutSpec asserts nanos and micros fixtures agree). */
  def events(s: SparkSession, d: String): DataFrame = {
    // needed to load a NANOS file at all; a no-op for non-NANOS columns
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }

  /** The layout-adaptive `ts` normalization behind [[events]], exposed
    * for readers that open an events-shaped parquet directly (e.g.
    * [[graft.streaming.EventStream.asOfStream]]'s static and streaming
    * legs). The caller must have set
    * `spark.sql.legacy.parquet.nanosAsLong=true` before the read if
    * the file may be NANOS-typed. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType =>
        // nanos-as-long: integer division — `/` would promote to double
        // and mangle ~1.7e18 nano epochs (53-bit mantissa)
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TIMESTAMP_NTZ (micros/millis): same instant under UTC
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
