package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus version diffing: which documents were added, removed,
  * changed, or left untouched between two snapshots — the bookkeeping
  * step of every incremental pipeline run (recompute embeddings/
  * signatures for `added ∪ changed` only; `Dedup.incrementalNearDups`
  * is the downstream consumer of exactly that delta).
  *
  * Shape at scale: each side collapses to (id, 16-byte content hash)
  * map-side, then ONE co-partitioned full-outer shuffle join on the
  * id — no text ever crosses the wire. md5 rather than xxhash64
  * because the statuses are engine-replayable that way
  * (q_corpus_diff); null text hashes as '' (a doc whose text is
  * nulled between versions reads as changed-to-empty, not
  * removed+added). */
object CorpusDiff {

  def diff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    def hashed(df: DataFrame, as: String) =
      df.select(col(idCol).as("id"),
        md5(coalesce(col(textCol), lit(""))).as(as))
    hashed(oldDf, "oh").join(hashed(newDf, "nh"), Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("oh").isNull, lit("added"))
          .when(col("nh").isNull, lit("removed"))
          .when(col("oh") === col("nh"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** The diff summarized to one row per status — the scale-friendly
    * output when the caller only needs counts (the per-doc frame
    * above feeds recomputation; this feeds the run report). */
  def diffCounts(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("cnt"))
}
