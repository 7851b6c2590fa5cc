package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic exact-size sampling.
  *
  * The corpus-pipeline gap these close: `df.sample(fraction)` gives a
  * BINOMIAL row count (different every run, and per partition), which
  * is wrong for "exactly n eval docs per source" manifests, and its
  * seed interacts with partitioning — a repartitioned rerun samples
  * different rows. Hash-rank sampling fixes both: the selection key is
  * md5 of row CONTENT, so the sample is a pure function of the data —
  * stable under repartitioning, stage retries, and incremental reruns
  * (the same doc is always in or always out), the same
  * determinism-over-randomness trade every split/mix operator here
  * makes (`TextAnalysis.hashSplit`, `sourceMix`).
  *
  * Scale shapes:
  *  - [[uniformSample]]: global top-n by hash = TakeOrderedAndProject
  *    — each task keeps n rows, the driver merges n·tasks, no full
  *    sort, no shuffle of the data.
  *  - [[stratifiedSample]]: n per stratum via [[Skew.saltedTopK]] —
  *    WindowGroupLimit bounds the per-stratum exchange for small n,
  *    the salted two-phase takes over for large n, so a hot stratum
  *    never funnels through one task.
  *
  * Both replay in an engine as `row_number() OVER (ORDER BY md5(...))`
  * (q_sample_stratified hash-checks the stratified form in DuckDB).
  */
object Sampling {

  /** The selection key: md5 over stratum + id. Strings, not the faster
    * xxhash64, because md5 hex compares identically in every engine —
    * the ORDER is the contract, and it must survive an oracle replay.
    * Nulls coalesce to '' so both engines order null strata the same
    * way. */
  private def selectionKey(stratumCol: String, idCol: String) =
    md5(concat(coalesce(col(stratumCol).cast("string"), lit("")), lit("#"),
      col(idCol).cast("string")))

  /** Exactly `n` rows (fewer iff the input is smaller), uniformly by
    * content hash of `idCol`, deterministic under any partitioning. */
  def uniformSample(df: DataFrame, idCol: String, n: Int): DataFrame = {
    require(n >= 1, s"uniformSample needs n >= 1, got $n")
    val keyed = df.withColumn("__sk",
      md5(concat(lit("#"), col(idCol).cast("string"))))
    keyed.orderBy(col("__sk"), col(idCol)).limit(n).drop("__sk")
  }

  /** Token-budget mixing: per stratum, keep documents in
    * content-hash order until the stratum's TOKEN budget is spent —
    * the epoch-composition step of training-data pipelines ("2B
    * tokens of web, 500M of code"), where [[stratifiedSample]]'s
    * row-count cut is the wrong unit. A doc is kept iff the
    * cumulative token count up to AND INCLUDING it stays ≤ the
    * budget (a prefix rule: token sums are non-negative, so the kept
    * set is a prefix of the hash order — deterministic and
    * incremental-stable like every hash-rank sampler here).
    *
    * Scale shape: one exchange for the per-stratum cumulative-sum
    * window (same accepted shape as `TextAnalysis.sourceCap` — a
    * stratum's running sum is inherently sequential; budgets
    * normally bind long before a stratum's tail is scanned).
    * `tokensCol` is any non-negative expression (nulls read as 0). */
  def tokenBudgetSample(df: DataFrame, stratumCol: String, idCol: String,
                        tokensCol: org.apache.spark.sql.Column,
                        budgets: Map[String, Long],
                        defaultBudget: Long): DataFrame = {
    require(defaultBudget >= 0 && budgets.values.forall(_ >= 0),
      "tokenBudgetSample budgets must be non-negative")
    Seq("__sk", "__tok", "__cum", "__budget").foreach(c =>
      require(!df.columns.contains(c),
        s"tokenBudgetSample: input already has a '$c' column"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__sk"), col(idCol))
    val budgetCol = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    df.withColumn("__sk", selectionKey(stratumCol, idCol))
      .withColumn("__tok", coalesce(tokensCol.cast("long"), lit(0L)))
      .withColumn("__cum", sum(col("__tok")).over(w))
      .filter(col("__cum") <= budgetCol)
      .drop("__sk", "__tok", "__cum")
  }

  /** Deterministic WEIGHTED sampling without replacement — exactly
    * `n` rows where a row's selection odds are proportional to its
    * weight (quality score, token count, upsampling factor): the
    * Efraimidis–Spirakis exponential-key scheme, key = ln(u)/w with
    * u a per-row uniform, top-n by key. The uniform comes from the
    * 60-bit md5 fold of the id — NOT an RNG — so like every sampler
    * here the result is a pure function of the data: stable under
    * repartitioning, retries, and reruns, and engine-replayable
    * (q_weighted_sample replays key and rank in DuckDB).
    *
    * Scale shape: map-side key + global top-n = TakeOrderedAndProject
    * (each task keeps n, driver merges n·tasks) — no shuffle of the
    * data, same as [[uniformSample]]. Rows with weight ≤ 0 or null
    * are excluded (zero mass). u ∈ (0, 1]: the fold is offset by +1
    * over 2^60 so ln(u) is finite; u = 1 gives key 0, the maximum —
    * ordering is (key DESC ⇔ u^(1/w) DESC as the E–S scheme
    * defines, since ln is monotone and w > 0). */
  def weightedSample(df: DataFrame, idCol: String,
                     weightCol: org.apache.spark.sql.Column,
                     n: Int): DataFrame = {
    require(n >= 1, s"weightedSample needs n >= 1, got $n")
    Seq("__w", "__u", "__k").foreach(c =>
      require(!df.columns.contains(c),
        s"weightedSample: input already has a '$c' column"))
    df.withColumn("__w", weightCol.cast("double"))
      .filter(col("__w").isNotNull && col("__w") > 0.0)
      // 'w#' domain separation: uniformSample keys on md5('#'+id),
      // and reusing that hash would make the two samplers' picks on
      // the same corpus deterministically anti-correlated (weighted
      // takes the large-hash tail, uniform the small-hash head) —
      // a distinct prefix keeps the draws independent-looking while
      // staying deterministic and replayable
      .withColumn("__u",
        (expr(graft.operators.Sketch.md5Hash60Sql(
          s"concat('w#', cast($idCol as string))")) + lit(1L))
          .cast("double") / lit(graft.operators.Sketch.M60))
      .withColumn("__k", log(col("__u")) / col("__w"))
      .orderBy(col("__k").desc, col(idCol))
      .limit(n)
      .drop("__w", "__u", "__k")
  }

  /** Deterministic epoch shuffle: the global random-looking ordering
    * a training run reads the corpus in, as a pure function of
    * (doc id, epoch) — no RNG state, so any worker (or a rerun, or a
    * resumed job) recomputes the identical permutation, and each
    * epoch is a fresh decorrelated order (the epoch number salts the
    * hash). This is the materialized-manifest alternative to
    * `df.orderBy(rand(seed))`, whose sample is partitioning-dependent
    * and whose seed must be re-plumbed per epoch.
    *
    * Output = input + (`sort_key` md5 hex, `shard` in [0, shards)),
    * repartitioned ON shard and sorted by (shard, sort_key) within
    * each task partition — the layout a `partitionBy(shard)` writer
    * consumes (per-shard files, rows already in read order; the
    * hash repartition may co-locate two shard values in one task,
    * which the shard-leading sort keeps contiguous). The global
    * order is (shard, sort_key): shard is a prefix of the same hash,
    * so concatenating shards in order IS the hash order restricted
    * to equal-shard prefixes — each shard is an unbiased 1/shards
    * subsample, the property epoch-sharded training loaders assume.
    *
    * Scale shape: one hash-partition exchange on `shard` + an
    * in-partition sort — no global sort, no driver state. The
    * permutation is fully determined by the emitted (shard,
    * sort_key) columns, which is what the gate oracle replays. */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   shards: Int): DataFrame = {
    require(shards >= 1, s"epochShuffle needs shards >= 1, got $shards")
    require(epoch >= 0, s"epochShuffle needs epoch >= 0, got $epoch")
    Seq("sort_key", "shard").foreach(c =>
      require(!df.columns.contains(c),
        s"epochShuffle: input already has a '$c' column"))
    val keyed = df
      .withColumn("sort_key",
        md5(concat(lit(s"$epoch#"), col(idCol).cast("string"))))
      .withColumn("shard",
        pmod(expr("cast(conv(substr(sort_key, 1, 15), 16, 10) as bigint)"),
          lit(shards.toLong)))
    // shard leads the in-partition sort: repartition hash-partitions
    // the shard VALUES, so two shards can land in one task partition
    // — with shard leading, each shard's rows are still contiguous
    // and in read order there, and a `partitionBy(shard)` writer
    // (the documented consumer) emits per-shard files already sorted
    keyed.repartition(shards, col("shard"))
      .sortWithinPartitions(col("shard"), col("sort_key"), col(idCol))
  }

  /** Exactly `n` rows per distinct value of `stratumCol` (fewer iff a
    * stratum is smaller), by per-stratum content-hash rank. `idCol`
    * must be unique per row (it is the hash input and the tiebreak —
    * a total order, as [[Skew.saltedTopK]] requires). */
  /** Temperature-scaled source mixing (the multilingual-pretraining
    * flattening rule: sample shares ∝ n_s^(1/T), so T = 1 keeps the
    * natural distribution and larger T lifts low-resource sources
    * toward uniform): every doc of source s is kept with rate
    *
    *   r_s = min(1, (w_s / W) · f · N / n_s),   w_s = n_s^(1/T)
    *
    * where n_s = source row counts, N = Σ n_s, f = `budgetFraction`
    * (the kept share of the corpus when nothing clamps). T = 1 makes
    * r_s = min(1, f) for every source — natural-distribution
    * subsampling; T → ∞ pushes shares uniform and rare sources clamp
    * at keep-everything. Membership is the [[TextAnalysis.sourceMix]]
    * rule with the rate computed IN-PLAN: the doc's md5-derived
    * uniform ('t#' domain) compared against r_s — deterministic,
    * repartition-stable, nested across budgets (a bigger f keeps a
    * superset).
    *
    * Exactness discipline: w_s is one pow() per source rounded to a
    * 1e-6 fixed-point long, W is an integer sum (a float Σ over
    * sources would be partition-order dependent), and r_s is a final
    * double expression from exact integers — so membership
    * hash-pins. Shape: one combinable count aggregate (sources rows),
    * the k-row rate table broadcast back onto the corpus, one
    * map-side filter. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     temperature: Double, budgetFraction: Double): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(budgetFraction > 0 && budgetFraction <= 1,
      s"budgetFraction must be in (0,1], got $budgetFraction")
    val invT = s"cast('${1.0 / temperature}' as double)"
    val f = s"cast('$budgetFraction' as double)"
    val counts = df
      .groupBy(col(sourceCol).as("__src"))
      .agg(count(lit(1)).as("__ns"))
      .withColumn("__wf",
        expr(s"cast(round(pow(cast(__ns as double), $invT) * 1e6) as bigint)"))
    val tot = counts.agg(sum(col("__ns")).as("__n"),
      sum(col("__wf")).as("__w"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("__src"),
        expr(s"""least(cast(1.0 as double),
                |  (cast(__wf as double) / cast(__w as double))
                |    * $f * cast(__n as double) / cast(__ns as double))"""
          .stripMargin).as("__rate"))
    val u = (expr(Sketch.md5Hash60Sql(
      s"concat('t#', cast($idCol as string))")) + lit(1L))
      .cast("double") / lit(Sketch.M60)
    df.join(broadcast(rates), col(sourceCol) <=> col("__src"))
      .filter(u < col("__rate"))
      .drop("__src", "__rate")
  }

  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       n: Int): DataFrame = {
    require(n >= 1, s"stratifiedSample needs n >= 1, got $n")
    require(!df.columns.contains("__sk"),
      "stratifiedSample: input already has a __sk column")
    val keyed = df.withColumn("__sk", selectionKey(stratumCol, idCol))
    Skew.saltedTopK(keyed, Seq(stratumCol), Seq(col("__sk"), col(idCol)),
        n, rankCol = "__rn", saltCols = Seq(col("__sk"), col(idCol)))
      .drop("__sk", "__rn")
  }
}
