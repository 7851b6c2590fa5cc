package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryPack, Tables}
import graft.operators.Similarity

/** Similarity search over `embeddings` (64-dim unit vectors).
  * Brute-force top-k is exact and DuckDB-oracle-able via
  * list_dot_product on the same literal query vector; IVF and
  * near-dup-pairs are the scale paths with rows-only checks plus
  * ScalaTest recall assertions against the exact baseline.
  */
object SimilarityPack extends QueryPack {

  /** Shared deterministic unit query vector (dim 64, seeded). */
  val queryVec: Seq[Double] = Similarity.seededUnitVector(64, seed = 1234L)

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_brute" -> ((s, d) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        queryVec, k = 10)),

    "q_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding",
        "label", queryVec, k = 10, nprobe = 3)),

    "q_embed_neardup" -> ((s, d) =>
      Similarity.nearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
        threshold = 0.40)),
  )

  override def oracleSql: Map[String, String] = {
    val lit = queryVec.map(_.toString).mkString("[", ", ", "]")
    Map(
      "q_ann_brute" ->
        s"""SELECT vec_id, round(sim, 4) AS sim FROM (
           |  SELECT vec_id,
           |    list_dot_product(CAST(embedding AS DOUBLE[]),
           |                     CAST($lit AS DOUBLE[])) AS sim
           |  FROM embeddings ORDER BY sim DESC, vec_id LIMIT 10
           |)""".stripMargin,
      // IVF probe selection is SQL-expressible through linearity:
      // dot(mean(v), q) == mean(dot(v, q)), so the top-nprobe
      // clusters by centroid·q are the top-nprobe by avg(v·q) — no
      // array unnesting needed. Rescan of the probed lists is then a
      // plain filtered top-k, matching Similarity.ivfTopK row-for-row.
      "q_ann_ivf" ->
        s"""WITH probed AS (
           |  SELECT label FROM embeddings
           |  GROUP BY label
           |  ORDER BY avg(list_dot_product(CAST(embedding AS DOUBLE[]),
           |                                CAST($lit AS DOUBLE[]))) DESC
           |  LIMIT 3
           |)
           |SELECT vec_id, round(sim, 4) AS sim FROM (
           |  SELECT vec_id,
           |    list_dot_product(CAST(embedding AS DOUBLE[]),
           |                     CAST($lit AS DOUBLE[])) AS sim
           |  FROM embeddings WHERE label IN (SELECT label FROM probed)
           |  ORDER BY sim DESC, vec_id LIMIT 10
           |)""".stripMargin,
      // q_embed_neardup: rows-only (hyperplane-LSH bucketing is not
      // SQL-expressible); recall vs the exact baseline is asserted in
      // SimilaritySpec.
    )
  }
}
