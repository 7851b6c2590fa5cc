package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled storage layout so equi-joins and
  * aggregations on the bucket key need NO exchange at read time — at
  * 100 TB this converts every recurring join on the key from a full
  * shuffle into a local zip of co-located buckets. The write pays the
  * shuffle once.
  */
object Bucketed {

  /** Persist `df` bucketed (and sorted) by `key` into `buckets`
    * buckets as a session-catalog table. Idempotent: drops a previous
    * table of the same name and clears a stale warehouse directory
    * (left behind if a prior write died between mkdir and metadata
    * commit). */
  def write(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val stale = java.nio.file.Paths.get(warehouse, table)
    if (java.nio.file.Files.exists(stale)) {
      java.nio.file.Files.walk(stale).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the executed plan contains a shuffle exchange —
    * bucketed joins on the bucket key must NOT. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
