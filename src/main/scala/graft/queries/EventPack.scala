package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryPack, Tables}
import graft.operators.Multimodal
import graft.streaming.EventStream

/** Events (windowed time aggregation — the batch twin of the
  * Structured Streaming pipeline) and multimodal blob plumbing.
  */
object EventPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // hourly tumbling window per event_type; same expressions as the
    // streaming query (EventStreamSpec asserts stream == batch)
    "q_event_window" -> ((s, d) =>
      EventStream.hourlyBatch(Tables.events(s, d))),

    // blob metadata projection: binary column + typed struct
    "q_multimodal_meta" -> ((s, d) =>
      Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
        .select(col("id"), octet_length(col("data")).cast("long").as("n_bytes"),
                col("meta.format").as("format"), col("meta.width").as("width"))),

    // stubbed decode + feature extraction over blob partitions
    "q_multimodal_features" -> ((s, d) => {
      val blobs = Multimodal.asBlobTable(Tables.documents(s, d), "doc_id", "text")
      Multimodal.extractFeatures(blobs).toDF()
        .select(col("id"), col("n_bytes"), col("checksum"))
    }),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_event_window" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
        |  event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_multimodal_meta" ->
      """SELECT doc_id AS id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  'txt' AS format, CAST(length(text) % 1024 AS INT) AS width
        |FROM documents""".stripMargin,
    // q_multimodal_features: rows-only — the stub decoder's checksum
    // is a JVM-side computation; pinned in MultimodalSpec.
  )
}
