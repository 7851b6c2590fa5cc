package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinct-count sketching.
  *
  * The scale path for "how many distinct X" when X's cardinality is
  * too large to count exactly: the reference has no sketches at all
  * (its `wc`-style jobs count exactly; SURVEY.md §2.4), so this is
  * beyond-reference surface for the corpus-stats pass of a training
  * pipeline.
  *
  * Two estimators ship:
  *  - Spark's built-in HyperLogLog++ (`approx_count_distinct`) — the
  *    production default: one pass, constant memory, mergeable
  *    map-side partials. Its estimate is implementation-specific, so
  *    it is pinned by a tolerance spec (DedupSpec), not the DuckDB
  *    hash gate.
  *  - [[kmvDistinct]] — the K-Minimum-Values estimator (Bar-Yossef et
  *    al. 2002): over a uniform hash h(x) ∈ [0, M), the k-th smallest
  *    DISTINCT hash value U_(k) estimates cardinality as
  *    (k−1) / (U_(k)/M). Every step is deterministic integer/double
  *    arithmetic over the 2^61−1 rolling hash — DuckDB-replayable, so
  *    q_approx_distinct hash-checks an actual sketch end-to-end.
  *
  * kmvDistinct's plan at scale: the distinct() is a map-side-partial
  * hash aggregate over 8-byte hashes (the same shuffle shape an exact
  * countDistinct pays), and the k-smallest cut is TakeOrdered — each
  * task keeps only k rows, the driver merges n_tasks·k. Nothing
  * driver-side grows with the data. (A streaming-style bounded-heap
  * per partition would avoid the distinct shuffle entirely; at that
  * point use the HLL column — the KMV's job here is to be the
  * REPLAYABLE twin, not to beat HLL.)
  */
object Sketch {

  /** 2^60: the hash space of [[md5Hash60Sql]], as the exact double
    * the estimator divides by. */
  final val M60: Double = 1152921504606846976.0d

  /** 60-bit uniformly-mixed content hash: the first 15 hex nibbles
    * of md5, parsed as an integer. This — not the faster 2^61−1
    * rolling hash — is the hash for estimators and per-bit
    * statistics: md5's avalanche makes the 60 bits i.i.d., where the
    * polynomial hash's structure (short strings map to SMALL values,
    * so high bits are mostly zero; low bits are byte-sum residues)
    * was measured to bias KMV by 8× and collapse simhash precision
    * to 0.03. Replayable in DuckDB byte-for-byte: md5 hex is
    * identical in both engines and the nibble parse is a 15-step
    * fold (TextPack.hexFoldSql). Both sides are builtin codegen'd
    * functions — no UDF, no custom registration needed. */
  def md5Hash60Sql(inner: String): String =
    s"cast(conv(substr(md5($inner), 1, 15), 16, 10) as bigint)"

  /** One-row frame (`approx_docs`: long) estimating the number of
    * distinct values of `valueCol` via KMV with parameter `k`.
    * Relative error ≈ 1/√(k−2); k = 1024 → ~3%. When the observed
    * distinct-hash count m is below k the estimator IS m (every
    * distinct hash was seen — exact up to hash collisions, which the
    * 60-bit space makes negligible at sketchable scales). */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 1024): DataFrame = {
    require(k >= 3, s"kmvDistinct needs k >= 3, got $k")
    val hv = df.select(expr(md5Hash60Sql(valueCol)).as("hv"))
      .filter(col("hv").isNotNull)
      .distinct()
    hv.orderBy(col("hv").asc).limit(k)
      .agg(max(col("hv")).as("hk"), count(lit(1)).as("m"))
      .select(
        when(col("m") < k, col("m"))
          .otherwise(floor(
            lit((k - 1).toDouble) /
              (col("hk").cast("double") / lit(M60))))
          .cast("long").as("approx_docs"))
  }
}
