package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryPack, Tables}
import graft.operators.Dedup

/** Dedup suite over `documents` (SURVEY.md §7.1 step 7 /
  * driver north-star ops). Exact dedup is DuckDB-oracle-able; the
  * LSH/banded variants are not SQL-expressible, so they carry the
  * driver's rows-only check and are cross-validated in ScalaTest
  * against brute-force exact Jaccard (recall + precision) instead.
  */
object DedupPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")),

    "q_dedup_minhash" -> ((s, d) =>
      Dedup.minhashNearDups(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8)),

    "q_dedup_ngram" -> ((s, d) =>
      Dedup.ngramNearDups(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.8)),

    "q_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDups(Tables.documents(s, d), "doc_id", "text",
        maxHamming = 3)),

    // incremental shape: even ids stand in for the already-deduped
    // corpus (signature table), odd ids for the incoming batch —
    // new×corpus candidates only (DedupSpec pins precision/recall
    // against brute-force cross pairs)
    "q_dedup_incremental" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      val shingler = Dedup.shingleHashes("text", 3)
      val corpusSigs = Dedup.signatures(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", shingler, 64, 42L)
      Dedup.incrementalNearDups(docs.filter(col("doc_id") % 2 === 1),
        corpusSigs, "doc_id", shingler, threshold = 0.8, k = 64, bands = 16)
    }),

    // pairs applied as a filter: corpus minus docs with a smaller
    // near-dup neighbor
    "q_dedup_drop" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.dropNearDups(docs, "doc_id",
        Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.8))
        .select("doc_id")
    }),

    // HLL sketch cardinality next to the exact answer: the constant-
    // memory scale path for distinct counts over arbitrary cardinality
    "q_approx_distinct" -> ((s, d) =>
      Tables.documents(s, d).agg(
        org.apache.spark.sql.functions.approx_count_distinct(
          org.apache.spark.sql.functions.col("text"), rsd = 0.02)
          .as("approx_docs"),
        org.apache.spark.sql.functions.countDistinct(
          org.apache.spark.sql.functions.col("text")).as("exact_docs"))),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      "SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text",
    // q_dedup_minhash / q_dedup_ngram / q_dedup_simhash /
    // q_dedup_incremental / q_dedup_drop: rows-only — LSH banding and
    // 64-bit signature arithmetic are not expressible in DuckDB SQL;
    // accuracy is pinned by DedupSpec instead.
    // q_approx_distinct: rows-only — HLL estimates are
    // implementation-specific; DedupSpec bounds the estimate against
    // the exact count.
  )
}
