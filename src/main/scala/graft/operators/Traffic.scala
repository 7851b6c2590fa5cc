package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Pct, Text}

/** The reference's canonical end-to-end workload (SURVEY.md §0,
  * reference MP4-RUN-Command.txt:1-15): filter traffic-signal rows by
  * `Interconne`, group by `Detection_`, and report each group's count
  * and share of the filtered total, formatted "%.2f%%".
  *
  * Semantics pinned to the Hadoop oracle pair
  * (hadoop/TrafficMapper.java:29-50 filter/normalize,
  * hadoop/TrafficReducer.java:29-38 global denominator + format);
  * header row is skipped via header=true, the intended behavior
  * (SURVEY.md §7.3.1).
  */
object Traffic {

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  def analyze(df: DataFrame, interconne: String): DataFrame = {
    val counts = df
      .filter(trim(col("Interconne")) === interconne)
      .select(Text.normalizeEmpty(col("Detection_")).as("detection"))
      .groupBy("detection").agg(count(lit(1)).as("cnt"))
    Pct.withPctOfTotal(counts, "cnt", "pct")
      .withColumn("pct_str", Pct.pctString(col("pct")))
  }

  def analyze(spark: SparkSession, csvPath: String,
              interconne: String): DataFrame =
    analyze(readCsv(spark, csvPath), interconne)
}
