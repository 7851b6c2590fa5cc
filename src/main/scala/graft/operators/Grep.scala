package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed grep, the reference's "MP1" surface
  * (reference client/client.py:69-142): fan a regex out over many
  * machines' log files, then either count matches per machine plus a
  * grand total (mode `c`, client.py:99-106) or fetch the matching
  * lines with a per-machine breakdown (mode `a`, client.py:107-123).
  *
  * Spark-first: one `spark.read.text(glob)` over all files — the
  * "fan-out" is the scan's task placement — with
  * `input_file_name()` standing in for the per-VM breakdown. The
  * regex filter is a pushed predicate; counts are partial-aggregated
  * map-side, so the driver receives one row per file, never the
  * matching lines themselves, regardless of input size.
  */
object Grep {

  /** Mode `c`: per-file match counts. */
  def countPerFile(spark: SparkSession, glob: String, regex: String): DataFrame =
    spark.read.text(glob)
      .filter(col("value").rlike(regex))
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("cnt"))

  /** Mode `c` grand total across machines (client.py:99-106). */
  def countTotal(spark: SparkSession, glob: String, regex: String): Long =
    spark.read.text(glob).filter(col("value").rlike(regex)).count()

  /** Mode `a`: matching lines, tagged with their source file. */
  def fetch(spark: SparkSession, glob: String, regex: String): DataFrame =
    spark.read.text(glob)
      .filter(col("value").rlike(regex))
      .select(input_file_name().as("file"), col("value"))

  /** Table-shaped grep: match a regex against one column of a typed
    * frame, break counts down by another (the per-machine analog). */
  def countPerKey(df: DataFrame, textCol: String, keyCol: String,
                  regex: String): DataFrame =
    df.filter(col(textCol).rlike(regex))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("cnt"))
}
