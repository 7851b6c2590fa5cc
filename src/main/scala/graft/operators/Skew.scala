package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting. AQE's skew-join handling covers
  * sort-merge joins at runtime; explicit salting remains the tool for
  * broadcast-ineligible skewed joins and for pre-aggregation when one
  * hot key would otherwise land on a single reducer.
  */
object Skew {

  /** Deterministic per-row salt in [0, saltFactor): a hash of
    * `saltCols`, or of EVERY column of `df` when `saltCols` is empty.
    *
    * The basis MUST be a pure function of row content — never
    * `monotonically_increasing_id()`, `rand()`, or anything
    * position-dependent. The salt doubles as part of a shuffle key,
    * and shuffle map output is recomputed on stage retry after
    * executor loss: a nondeterministic salt re-salts the recomputed
    * rows into different buckets than the ones downstream tasks have
    * already consumed, silently dropping or duplicating rows.
    * Invisible at local[32] (no retries); routine at 1000-executor
    * scale. Content-hashing also makes the salt invariant to the
    * input's partitioning — pinned in SkewBucketSpec.
    *
    * Prefer a narrow `saltCols` basis on wide rows: the full-row
    * default hashes every column, so its cost grows with row width
    * (for a document table that is the entire text, per row). The
    * default SKIPS column types xxhash64 cannot hash (maps, and any
    * nesting of them) so schemas that worked before salting keep
    * working; an explicit `saltCols` is the caller's responsibility.
    *
    * Determinism's price: rows IDENTICAL across the basis share a
    * bucket. A hot key whose rows are full duplicates (or a frame
    * projected down to just the key) therefore degenerates to ONE
    * bucket — correct, but no spread. There is no way around this:
    * any salt that distinguishes identical rows is position-dependent
    * and re-salts on retry. Give the frame (or `saltCols`) a
    * distinguishing column — an event id, a file offset — to spread
    * duplicate-heavy hot keys. */
  private[graft] def rowSalt(df: DataFrame, saltCols: Seq[Column],
                             saltFactor: Int): Column = {
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType => s.fields.forall(f => hashable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case _ => true
    }
    val basis = if (saltCols.nonEmpty) saltCols
                else df.schema.fields.toIndexedSeq
                  .filter(f => hashable(f.dataType)).map(f => col(f.name))
    // an all-unhashable schema leaves no basis: constant salt —
    // degenerate (single bucket) but correct and retry-safe
    if (basis.isEmpty) lit(0)
    else pmod(xxhash64(basis: _*), lit(saltFactor)).cast("int")
  }

  /** Join `big` (skewed) with `small` on `key`, spreading each hot key
    * over `saltFactor` partitions: the big side gets a per-row salt,
    * the small side is replicated once per salt value. Result is
    * row-identical to the unsalted join; only the key distribution of
    * the exchange changes.
    *
    * The salt is a deterministic content hash ([[rowSalt]] — see its
    * note on why `monotonically_increasing_id()` would drop rows on
    * stage retry) of `saltCols`, defaulting to the big side's full
    * row. A narrow basis should still VARY within a hot key's rows:
    * columns constant per key leave the whole key in one bucket —
    * correct, but no spread.
    *
    * Measured (SkewJoinBench, local[32], 24M rows with 90% on one
    * key, small side forced past broadcast): salted ~2.2 s vs ~5.9 s
    * plain sort-merge — 2.6×. Lowering AQE's skew-join split
    * threshold to 8 MB did not move the plain join in that setup; the
    * explicit salt was the lever that did. None of this applies when
    * the small side broadcasts — a map-side hash join never
    * concentrates a hot key. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 saltFactor: Int, saltCols: Seq[Column] = Nil): DataFrame = {
    require(saltFactor >= 1)
    val salts = array((0 until saltFactor).map(lit): _*)
    val bigS = big.withColumn("__salt", rowSalt(big, saltCols, saltFactor))
    val smallS = small.withColumn("__salt", explode(salts))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase count for a skewed grouping key: count per (key, salt)
    * first (spreads the hot key), then sum per key. Spark's partial
    * aggregation already does this for simple counts; the explicit
    * form is for aggregates whose partial form is expensive (e.g.
    * collect-style) or when the first-phase output feeds further
    * per-salt processing. Salt determinism: see [[rowSalt]] — a
    * nondeterministic salt could split a key's partial counts on
    * stage retry. */
  def saltedGroupCount(df: DataFrame, key: String, saltFactor: Int,
                       saltCols: Seq[Column] = Nil): DataFrame =
    df.withColumn("__salt", rowSalt(df, saltCols, saltFactor))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("cnt"))

  /** Exact top-k per group, picking the fastest plan for `k`.
    *
    * The classic worry — `row_number().over(partitionBy(group))`
    * sends EVERY row of a group to one task — no longer holds on
    * Spark ≥ 3.5 for SMALL k: the optimizer's WindowGroupLimit rule
    * rewrites `filter(rank <= k)` into a partial per-partition top-k
    * BEFORE the shuffle, so the hot group's reducer receives at most
    * k·partitions rows from a single exchange. TopKBench (6M rows,
    * 90% in one group) measures the plain window at ~0.55 s vs
    * ~0.95 s for the explicit two-phase salted form — the salt's
    * second shuffle is pure overhead there. But the rule only fires
    * for k ≤ `spark.sql.optimizer.windowGroupLimitThreshold`
    * (default 1000); above it the plain window really does funnel the
    * whole hot group through one task, and the same bench measures
    * salted ~1.7 s vs plain ~13.9 s at k=2000 — an 8× win.
    *
    * So this DISPATCHES: plain single window when the optimizer will
    * bound it (k ≤ threshold), explicit salted two-phase otherwise.
    * Phase 1 of the salted form ranks within (group, salt) — the true
    * global top-k all survive, because any row globally above one of
    * them inside its bucket is also globally above it (holds for ANY
    * deterministic bucketing, so `saltCols` never affects the
    * result); phase 2 re-ranks the ≤ k·saltFactor survivors. Output
    * rows and ranks equal the single-window form PROVIDED `orderCols`
    * is a total order (include tiebreaker columns); ties at the cut
    * make both forms nondeterministic. `rankCol` carries the final
    * 1..k rank.
    *
    * The salt must be a deterministic content hash, never
    * `monotonically_increasing_id()` — see [[rowSalt]] for the
    * stage-retry hazard. Pass `saltCols` (the group columns plus the
    * expressions under `orderCols` are the natural choice: the
    * total-order requirement already makes them deterministic and
    * well-distributed) to avoid the full-row default hashing wide
    * payload columns — or any column type xxhash64 rejects. The
    * basis cannot be derived from `orderCols` automatically because
    * `.desc`/`.asc` sort wrappers are not unwrappable through the
    * public Column API (Spark 4 hides the expression tree). */
  def saltedTopK(df: DataFrame, groupCols: Seq[String],
                 orderCols: Seq[Column], k: Int,
                 saltFactor: Int = 64, rankCol: String = "rn",
                 saltCols: Seq[Column] = Nil): DataFrame = {
    require(k >= 1 && saltFactor >= 1)
    require(!df.columns.contains("__salt"),
      "saltedTopK: input already has a __salt column")
    require(!df.columns.contains(rankCol),
      s"saltedTopK: input already has a '$rankCol' column — pass a free rankCol")
    val gcols = groupCols.map(col)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(orderCols: _*)
    // -1 disables the rule entirely; a garbage value reads as 1000
    val groupLimitThreshold = df.sparkSession.conf
      .get("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
      .toIntOption.getOrElse(1000)
    if (k <= groupLimitThreshold && groupLimitThreshold >= 0)
      // WindowGroupLimit bounds this to one exchange of ≤ k rows per
      // (group, input partition) — measured faster than salting
      df.withColumn(rankCol, row_number().over(w2))
        .filter(col(rankCol) <= k)
    else
      saltedTopKForced(df, groupCols, orderCols, k, saltFactor, rankCol,
        saltCols)
  }

  /** The explicit two-phase salted form, regardless of the
    * WindowGroupLimit threshold — the arm [[saltedTopK]] dispatches to
    * for large k, exposed separately so TopKBench and the equivalence
    * spec can measure/exercise it under the default conf. */
  private[graft] def saltedTopKForced(df: DataFrame, groupCols: Seq[String],
                                      orderCols: Seq[Column], k: Int,
                                      saltFactor: Int = 64,
                                      rankCol: String = "rn",
                                      saltCols: Seq[Column] = Nil): DataFrame = {
    require(k >= 1 && saltFactor >= 1)
    val gcols = groupCols.map(col)
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols :+ col("__salt"): _*).orderBy(orderCols: _*)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(gcols: _*).orderBy(orderCols: _*)
    df.withColumn("__salt", rowSalt(df, saltCols, saltFactor))
      .withColumn(rankCol, row_number().over(w1))
      .filter(col(rankCol) <= k)
      .drop("__salt")
      .withColumn(rankCol, row_number().over(w2))
      .filter(col(rankCol) <= k)
  }
}
