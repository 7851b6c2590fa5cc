package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/filter EVALUATION over scored corpora — the measurement
  * half of every quality-gate decision a training-data pipeline makes
  * (does the quality score actually separate the population I care
  * about, and where do I put the threshold?). Beyond-reference
  * (SURVEY.md §2.9): the reference has no scoring surface at all.
  *
  * Both operators are EXACT and engine-replayable by construction —
  * all accumulation is integer/decimal until one final division (the
  * q_unigram_xent fixed-point discipline), so the gate hash-pins them
  * against DuckDB rather than asserting a tolerance.
  */
object Eval {

  /** Exact ROC-AUC of `scoreCol` as a ranker of binary `labelCol`
    * (0/1) — the Mann–Whitney U form with midrank tie handling, the
    * textbook estimator: AUC = P(score⁺ > score⁻) + ½·P(tie).
    *
    * Scale shape: ONE groupBy on the score value (map-side partial
    * aggregation — shuffle rows are bounded by DISTINCT scores, not
    * corpus rows; a round-6 quality score has ≤ 10⁶ distinct values
    * however large the corpus), one ordered window over that
    * distinct-score frame (single partition by necessity — but over
    * the reduction, never the corpus), one 1-row final aggregate.
    * Arithmetic stays in longs until the final division: with
    * `before` = rows scoring strictly lower and `c`/`cp` = rows /
    * positives at this score, every tied row's midrank is
    * (2·before + c + 1)/2, so 2·Σ(positive ranks) =
    * Σ cp·(2·before + c + 1) ≡ s2 and
    * AUC = (s2 − np(np+1)) / (2·np·nn) — integer numerator and
    * denominator, one double division, round-6. Output one row:
    * (auc, n_pos, n_neg); auc NULL when a class is empty (no pairs
    * to rank — the honest degenerate answer). Null scores/labels are
    * excluded.
    *
    * `before` (rows scoring strictly lower) has TWO shapes, picked
    * from the input's plan-stats size the way [[Spread.ensureWidth]]
    * does (scale-adaptive, never a constant; `distributedMinBytes`
    * overrides for tests, -1 = derive):
    *
    *  - SMALL input (estimated bytes under defaultParallelism ×
    *    maxPartitionBytes — it scans in one task wave, so the
    *    distinct-score reduction is bounded by a modest input): one
    *    ordered window over the reduction. Single partition, but over
    *    the reduction — the bounded-window class the topK/vocab
    *    windows are in; measured 2-3× cheaper than the distributed
    *    form at sf0.1 (0.6 vs 1.5 s q_filter_auc, interleaved A/B).
    *  - LARGE input: for a continuous score the reduction IS the
    *    corpus (the r21 verdict's scale bug — a single-partition sort
    *    of everything), so the prefix is computed distributively:
    *    range-partition the distinct scores (partition order == score
    *    order), per-partition ordered running sums — parallel windows
    *    — and fold the cross-partition prefix ALGEBRAICALLY: with
    *    off_p = Σ_{q<p} C_q,
    *      s2 = Σ_p [Σ_s∈p cp·(2·within + c + 1)] + 2·Σ_p off_p·CP_p,
    *    so one pass reduces to per-partition rows (pid, C, CP, s2in,
    *    nn) — bounded by the shuffle partition count — fetched to the
    *    driver like any other bounded model artifact (the k-means
    *    centroid-read precedent). Single consumer of the range
    *    exchange: no cache, no pid-stability hazard (range boundary
    *    sampling is per-evaluation). Accumulation stays in exact
    *    longs either way, and the final division + round ride the
    *    same Spark expressions, so both shapes are bit-identical
    *    (EvalSpec forces and pins each). */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
             distributedMinBytes: Long = -1L): DataFrame = {
    val g = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("s"))
      .agg(count(lit(1)).as("c"), sum(col(labelCol).cast("long")).as("cp"))
    val spark = df.sparkSession
    val threshold =
      if (distributedMinBytes >= 0) BigInt(distributedMinBytes)
      else {
        val splitBytes =
          try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
          catch { case scala.util.control.NonFatal(_) => 128L << 20 }
        BigInt(spark.sparkContext.defaultParallelism) * splitBytes
      }
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (est < threshold) {
      val w = Window.orderBy(col("s"))
        .rowsBetween(Window.unboundedPreceding, -1)
      return g
        .withColumn("before", coalesce(sum(col("c")).over(w), lit(0L)))
        .agg(
          sum(col("cp") * (lit(2L) * col("before") + col("c") + lit(1L)))
            .as("s2"),
          sum(col("cp")).as("np"),
          sum(col("c") - col("cp")).as("nn"))
        .select(
          when(col("np") > 0 && col("nn") > 0,
            round((col("s2") - col("np") * (col("np") + lit(1L)))
                .cast("double")
              / (lit(2.0) * col("np") * col("nn")), 6))
            .as("auc"),
          coalesce(col("np"), lit(0L)).as("n_pos"),
          coalesce(col("nn"), lit(0L)).as("n_neg"))
    }
    val wIn = Window.partitionBy(col("pid")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val perPid = g.repartitionByRange(col("s"))
      .withColumn("pid", spark_partition_id())
      .withColumn("within", coalesce(sum(col("c")).over(wIn), lit(0L)))
      .groupBy("pid")
      .agg(sum(col("c")).as("pc"), sum(col("cp")).as("pcp"),
        sum(col("cp") * (lit(2L) * col("within") + col("c") + lit(1L)))
          .as("s2in"),
        sum(col("c") - col("cp")).as("pnn"))
      .collect()
      .sortBy(_.getAs[Int]("pid"))
    var off = 0L; var s2 = 0L; var np = 0L; var nn = 0L
    perPid.foreach { r =>
      s2 += r.getAs[Long]("s2in") + 2L * off * r.getAs[Long]("pcp")
      np += r.getAs[Long]("pcp")
      nn += r.getAs[Long]("pnn")
      off += r.getAs[Long]("pc")
    }
    import spark.implicits._
    Seq((s2, np, nn)).toDF("s2", "np", "nn")
      .select(
        when(col("np") > 0 && col("nn") > 0,
          round((col("s2") - col("np") * (col("np") + lit(1L)))
              .cast("double")
            / (lit(2.0) * col("np") * col("nn")), 6))
          .as("auc"),
        col("np").as("n_pos"),
        col("nn").as("n_neg"))
  }

  /** Reliability diagram input — the calibration companion to
    * [[rocAuc]]: rows bucketed into `bins` equal-width score bins on
    * [0, 1] (scores ≥ 1 clamp into the top bin), per bin the count,
    * positive count, EXACT mean score (decimal accumulation — no
    * partition-order float drift) and positive rate. A well-
    * calibrated score has pos_rate ≈ mean_score per bin; a ranker
    * that separates but mis-calibrates shows monotone pos_rate far
    * from the diagonal — the difference between usable-as-threshold
    * and usable-only-as-order. One map-side bin assignment + one
    * bins-bounded aggregation; the mean accumulates in 1e-6
    * FIXED-POINT longs (sums of longs are exact and order-free; a
    * double mean would drift with partition order, and decimal
    * division scales differ across engines — the d2f discipline). */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
                      bins: Int = 10): DataFrame = {
    require(bins >= 2, s"calibrationBins needs bins >= 2, got $bins")
    df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(
        least(floor(col(scoreCol) * bins), lit(bins - 1)).cast("int")
          .as("bin"),
        round(col(scoreCol) * lit(1e6), 0).cast("long").as("sm"),
        col(labelCol).cast("long").as("lbl"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum(col("lbl")).as("n_pos"),
        round(sum(col("sm")).cast("double") / count(lit(1)) / lit(1e6), 6)
          .as("mean_score"),
        round(sum(col("lbl")).cast("double") / count(lit(1)), 6)
          .as("pos_rate"))
  }
}
