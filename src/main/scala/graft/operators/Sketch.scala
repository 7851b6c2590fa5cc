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

  /** Per-group KMV: [[kmvDistinct]] with the k-smallest cut taken
    * WITHIN each group — "approx distinct texts per source" without a
    * per-group exact aggregate. The distinct() still shuffles (group,
    * 8-byte hash) pairs — same shape as the global form — and the
    * per-group top-k runs through [[Skew.saltedTopK]], so a hot group
    * never funnels one task. Output (groupCol, approx_distinct).
    * Same estimator, same engine-replayability (q_approx_distinct_
    * grouped replays the window rank in DuckDB). */
  def kmvDistinctGrouped(df: DataFrame, groupCol: String, valueCol: String,
                         k: Int = 1024): DataFrame = {
    require(k >= 3, s"kmvDistinctGrouped needs k >= 3, got $k")
    val hv = df.select(col(groupCol).as("g"),
        expr(md5Hash60Sql(valueCol)).as("hv"))
      .filter(col("hv").isNotNull).distinct()
    Skew.saltedTopK(hv, Seq("g"), Seq(col("hv").asc), k,
        rankCol = "__kmv_rn", saltCols = Seq(col("g"), col("hv")))
      .groupBy(col("g"))
      .agg(max(col("hv")).as("hk"), count(lit(1)).as("m"))
      .select(col("g").as(groupCol),
        when(col("m") < k, col("m"))
          .otherwise(floor(
            lit((k - 1).toDouble) /
              (col("hk").cast("double") / lit(M60))))
          .cast("long").as("approx_distinct"))
  }

  /** Cross-corpus overlap estimate — the planning number a dedup or
    * mixing decision needs BEFORE paying for a full cross join:
    * |A|, |B| and |A∪B| each estimated by [[kmvDistinct]]'s KMV over
    * the SAME 60-bit hash, then |A∩B| = |A| + |B| − |A∪B| by
    * inclusion–exclusion (clamped at 0) and the distinct-Jaccard
    * from the same numbers. Three bounded sketches — the corpora are
    * scanned once each (the union side re-scans both projections),
    * nothing wider than 8-byte hashes shuffles, and the result is
    * one row regardless of scale. Exact below k per side, ~1/√k
    * relative error above; the signs can make a small intersection
    * of two huge corpora noisy — this is the triage number, not the
    * dedup itself. Output: (approx_a, approx_b, approx_union,
    * approx_intersection, approx_jaccard round-6). */
  def kmvOverlap(a: DataFrame, b: DataFrame, valueCol: String,
                 k: Int = 1024): DataFrame = {
    val ea = kmvDistinct(a, valueCol, k).select(col("approx_docs").as("approx_a"))
    val eb = kmvDistinct(b, valueCol, k).select(col("approx_docs").as("approx_b"))
    val eu = kmvDistinct(
        a.select(col(valueCol)).unionAll(b.select(col(valueCol))), valueCol, k)
      .select(col("approx_docs").as("approx_union"))
    // all three sides are 1-row aggregates; broadcast for intent
    // and stats-miss safety (the file's threshold idiom below)
    ea.crossJoin(broadcast(eb)).crossJoin(broadcast(eu))
      .withColumn("approx_intersection",
        greatest(lit(0L), col("approx_a") + col("approx_b") - col("approx_union")))
      .withColumn("approx_jaccard",
        round(col("approx_intersection").cast("double")
          / col("approx_union").cast("double"), 6))
  }

  /** Bucket of `valueExpr` in row `rowExpr` of a width-`width`
    * count-min sketch: the 60-bit md5 hash of the value,
    * domain-separated per row by a '#row' suffix, mod width. Pure
    * builtin arithmetic — DuckDB replays it digit-for-digit
    * (q_cms_freq). */
  def cmsBucketSql(valueExpr: String, rowExpr: String, width: Int): String =
    s"pmod(${md5Hash60Sql(s"concat($valueExpr, '#', cast($rowExpr as string))")}, $width)"

  /** Count-min sketch (Cormode & Muthukrishnan 2005) over the stream
    * of `valueCol` values: `depth` rows of `width` counters,
    * counter(i, b) = number of rows whose row-i hash lands in bucket
    * b. The 100 TB property: the aggregate has at most depth·width
    * distinct keys REGARDLESS of the value cardinality — where an
    * exact `groupBy(value).count()` over a 10⁸-key token vocabulary
    * shuffles every key, the sketch's shuffle is bounded by two small
    * parameters, and the per-partition partials are mergeable by
    * plain addition (pinned in CmsSpec). Output: (i, bucket, cnt). */
  def cmsCounters(df: DataFrame, valueCol: String,
                  width: Int, depth: Int): DataFrame = {
    require(width >= 2, s"cms width must be >= 2, got $width")
    require(depth >= 1, s"cms depth must be >= 1, got $depth")
    df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
      .select(explode(array((0 until depth).map(lit): _*)).as("i"), col("v"))
      .select(col("i"), expr(cmsBucketSql("v", "i", width)).as("bucket"))
      .groupBy(col("i"), col("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Point-query the sketch: for every distinct probe value, the
    * count-min estimate min_i counter(i, bucket_i(v)) — an upper
    * bound on the true frequency (collisions only ADD), exact when no
    * probe collides in some row. Standard error bound: overestimate
    * ≤ 2N/width with probability ≥ 1 − 2^−depth. Absent buckets read
    * as 0, so never-seen values estimate 0, not null. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, valueCol: String,
                  width: Int, depth: Int): DataFrame =
    probes.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull).distinct()
      .select(col("v"), explode(array((0 until depth).map(lit): _*)).as("i"))
      .select(col("v"), col("i"), expr(cmsBucketSql("v", "i", width)).as("bucket"))
      .join(counters, Seq("i", "bucket"), "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
      .select(col("v").as(valueCol), col("est"))

  /** Build + probe in one call (the q_cms_freq composition). */
  def cmsFreq(df: DataFrame, valueCol: String, probes: DataFrame,
              width: Int = 4096, depth: Int = 4): DataFrame =
    cmsEstimate(cmsCounters(df, valueCol, width, depth), probes, valueCol,
      width, depth)

  /** EXACT heavy hitters with sketch-bounded shuffle: every distinct
    * value of `valueCol` whose frequency is ≥ `support` · N, with its
    * exact count — the Misra–Gries two-pass (candidates from a
    * constant-memory per-partition sketch, then an exact recount of
    * candidates only).
    *
    * Why not plain `groupBy(value).count()`: at corpus scale the
    * full-cardinality aggregate shuffles EVERY distinct value (token
    * vocabularies run 10⁸⁺ keys) to answer a question whose output is
    * ≤ 1/support rows. Here the only wide operations ever see
    * candidate rows:
    *  - Pass 1 (`mapPartitions`, the sanctioned use: genuinely
    *    imperative per-partition state): Misra–Gries with c counters
    *    per partition. Pigeonhole over partition totals N_p: an item
    *    with global count > N/(c+1) = Σ N_p/(c+1) beats N_p/(c+1)
    *    somewhere, and MG retains every such local item — so the
    *    union of per-partition survivor sets is a SUPERSET of the
    *    true heavy hitters whenever c + 1 ≥ 1/support (enforced;
    *    default c = ⌈2/support⌉ for margin). ≤ c · numPartitions
    *    candidate values total, broadcast to pass 2.
    *  - Pass 2: exact count restricted to candidates (broadcast semi
    *    filter → map-side partial agg), then the ≥ ⌈support·N⌉ cut.
    *    False candidates die here, so the OUTPUT is exact and
    *    sketch-free — fully engine-replayable (q_heavy_hitters), the
    *    same two-pass trick that made q_approx_distinct gateable.
    * N counts non-null values; three narrow scans of one column, no
    * full-cardinality shuffle anywhere. MG decrement-all amortizes:
    * each decrement burns c+1 prior arrivals, so pass 1 is O(rows). */
  def heavyHitters(df: DataFrame, valueCol: String, support: Double,
                   counters: Int = 0): DataFrame = {
    require(support > 0 && support < 1,
      s"heavyHitters needs support in (0,1), got $support")
    val c = if (counters > 0) counters else math.ceil(2.0 / support).toInt
    require(c + 1 >= 1.0 / support,
      s"counters=$c cannot guarantee support=$support (need counters + 1 >= ${1.0 / support})")
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
      .filter(col("v").isNotNull)
    val candidates = vals.as[String].mapPartitions { it =>
      val counts = new java.util.HashMap[String, Long]()
      it.foreach { v =>
        val cur = counts.get(v)
        if (cur != null || counts.size < c) // null unboxes to 0 below
          counts.put(v, (if (cur == null) 0L else cur.longValue()) + 1L)
        else {
          val e = counts.entrySet().iterator()
          while (e.hasNext) {
            val kv = e.next()
            if (kv.getValue == 1L) e.remove() else kv.setValue(kv.getValue - 1L)
          }
        }
      }
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        counts.keySet().iterator()).asScala
    }.toDF("v").distinct()
    val total = vals.agg(count(lit(1)).as("n"))
    vals.join(broadcast(candidates), Seq("v"), "left_semi")
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") >= ceil(lit(support) * col("n")))
      .select(col("v").as(valueCol), col("cnt"))
  }
}
