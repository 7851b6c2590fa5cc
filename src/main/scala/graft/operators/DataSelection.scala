package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling data selection (DSIR-shaped; Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): pick raw-corpus docs whose hashed-token distribution
  * looks like a TARGET corpus, by importance weight under two bucket
  * unigram models. This is the principled middle ground between "keep
  * everything" and a hard classifier cut — the selected set's feature
  * distribution converges to the target's as n grows, instead of
  * collapsing onto the single highest-scoring mode the way top-k by a
  * quality score does.
  *
  * Features are HASHED buckets (`buckets` of them), not a vocabulary:
  * the model size is a parameter, fixed regardless of corpus scale —
  * the paper's trick that makes the estimator cheap at any size. Both
  * bucket tables are Laplace-smoothed (+1), so empty buckets are
  * finite and the log-ratio of an unseen bucket is well-defined.
  *
  * All scoring follows the repo's fixed-point discipline: ONE ln per
  * (doc, bucket) over an exact smoothed-count cross-ratio, rounded to
  * a 1e-9 long, weighted by the bucket's in-doc multiplicity, summed
  * as integers — partition-order independent and DuckDB-replayable.
  */
object DataSelection {

  /** Hashed-unigram bucket counts (bucket, c) over `textCol` —
    * `buckets` rows at most, whatever the corpus size. Tokens are the
    * non-empty single-space split (the [[TextAnalysis]] convention);
    * the bucket is the 60-bit md5 mix of the 'b#'-prefixed token
    * (domain-separated from the samplers' id hashes) mod `buckets` —
    * md5, not xxhash64, so any engine can replay the assignment. */
  def bucketCounts(df: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"bucketCounts needs buckets >= 2, got $buckets")
    df.select(explode(expr(
        s"filter(split(coalesce($textCol, ''), ' '), x -> x != '')")).as("tok"))
      .select(expr(
        s"pmod(${Sketch.md5Hash60Sql("concat('b#', tok)")}, $buckets)")
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("c"))
  }

  /** Per-doc DSIR importance log-weight against a target corpus:
    *
    *   log w(x) = Σ_tokens ln( ((ct_b + 1) · (Ns + B))
    *                         / ((cs_b + 1) · (Nt + B)) )
    *
    * where ct/cs are target/source bucket counts, Nt/Ns the token
    * totals, B = `buckets`, and b the token's bucket — i.e. the
    * hashed-unigram log-likelihood ratio with Laplace smoothing.
    * `source` defaults to `docs` itself (the usual raw-corpus case);
    * pass it explicitly when weights should be relative to a
    * different background.
    *
    * Scale shape: the corpus side collapses to per-doc (bucket, m)
    * multiplicities — at most `buckets` rows per doc — and joins ONE
    * broadcast B-row ratio table built from two B-row aggregates;
    * totals ride as 1-row broadcasts folded into the same table. No
    * shuffle wider than the per-doc bucket collapse. Output:
    * (doc_id, n_tokens, log_w round-6). */
  /** The B-row (bucket, lr) ratio table both the batch scorer and the
    * streaming twin join against: per-bucket Laplace-smoothed
    * log-likelihood ratio of target vs source, as a 1e-9 fixed-point
    * long. Built over the FULL bucket spine — a bucket absent from
    * both counts still has a (smoothed) ratio, so no token is ever
    * dropped by the scoring join. This IS the persisted model
    * artifact of a production DSIR run (B rows, fit once). */
  def dsirRatioTable(target: DataFrame, targetTextCol: String,
                     source: DataFrame, sourceTextCol: String,
                     buckets: Int): DataFrame = {
    require(buckets >= 2, s"dsirRatioTable needs buckets >= 2, got $buckets")
    val ct = bucketCounts(target, targetTextCol, buckets)
      .withColumnRenamed("c", "ct")
    val cs = bucketCounts(source, sourceTextCol, buckets)
      .withColumnRenamed("c", "cs")
    val nt = ct.agg(coalesce(sum(col("ct")), lit(0L)).as("n_t"))
    val ns = cs.agg(coalesce(sum(col("cs")), lit(0L)).as("n_s"))
    val spine = target.sparkSession.range(0, buckets).toDF("bucket")
    spine
      .join(ct, Seq("bucket"), "left").join(cs, Seq("bucket"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(ns))
      .select(col("bucket"),
        round(expr(
          s"""ln((cast(coalesce(ct, 0) + 1 as double)
             |    * cast(n_s + $buckets as double))
             |   / (cast(coalesce(cs, 0) + 1 as double)
             |      * cast(n_t + $buckets as double))) * 1e9""".stripMargin))
          .cast("bigint").as("lr"))
  }

  /** The token→bucket assignment both scorers share. */
  private[graft] def bucketExpr(buckets: Int): String =
    s"pmod(${Sketch.md5Hash60Sql("concat('b#', tok)")}, $buckets)"

  /** Per-token (doc_id, bucket) stream — the tokenize + hash-assign
    * stage EVERY scorer shares (batch weights, the stored-model bench
    * shape, the streaming ingest twin, the quality classifier's
    * feature map). Works on a streaming DataFrame too: it is pure
    * select/explode, no aggregation. */
  def tokenBuckets(docs: DataFrame, idCol: String, textCol: String,
                   buckets: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"), explode(expr(
        s"filter(split(coalesce($textCol, ''), ' '), x -> x != '')")).as("tok"))
      .select(col("doc_id"), expr(bucketExpr(buckets)).as("bucket"))

  /** Per-doc (doc_id, bucket, m) multiplicities — [[tokenBuckets]]
    * collapsed per doc, at most `buckets` rows per doc regardless of
    * document length. The batch scorers' join side. */
  def docBucketCounts(docs: DataFrame, idCol: String, textCol: String,
                      buckets: Int): DataFrame =
    tokenBuckets(docs, idCol, textCol, buckets)
      .groupBy(col("doc_id"), col("bucket")).agg(count(lit(1)).as("m"))

  /** DSIR scoring against a GIVEN ratio table — the serve path of a
    * fit-once/score-many deployment, and the ONE copy of the scoring
    * arithmetic ([[dsirLogWeights]] fits then delegates here; the
    * stored-model bench shape calls this directly; the streaming twin
    * shares [[tokenBuckets]] and the same lr-sum semantics in its
    * state fold). Per-doc bucket multiplicities → broadcast B-row
    * ratio join → exact fixed-point sum → one round-6 read-out;
    * tokenless docs emit (0, 0.0). */
  def dsirLogWeightsFromRatios(docs: DataFrame, idCol: String,
                               textCol: String, ratios: DataFrame,
                               buckets: Int): DataFrame = {
    val perDoc = docBucketCounts(docs, idCol, textCol, buckets)
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("m")).as("n_tokens"), sum(col("m") * col("lr")).as("__s"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__s"), lit(0L)).cast("double") / lit(1e9), 6)
          .as("log_w"))
  }

  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     target: DataFrame, targetTextCol: String,
                     buckets: Int = 4096,
                     source: DataFrame = null,
                     sourceTextCol: String = null): DataFrame = {
    val src = Option(source).getOrElse(docs)
    val stc = Option(sourceTextCol).getOrElse(textCol)
    val ratios = dsirRatioTable(target, targetTextCol, src, stc, buckets)
    dsirLogWeightsFromRatios(docs, idCol, textCol, ratios, buckets)
  }

  /** Gumbel-top-n importance resample: n docs drawn WITHOUT
    * replacement with probability ∝ exp(log w) — the Gumbel-max trick
    * makes that a deterministic top-n by log w + Gumbel noise, and
    * the noise is derived from the doc id's md5 ('g#' domain), so the
    * draw is reproducible across runs, partitionings and engines (the
    * [[Sampling.weightedSample]] Efraimidis–Spirakis precedent, in
    * log space where DSIR weights actually live — exp(log_w) would
    * overflow a double long before a real corpus stops needing it).
    * Returns the selected docs' (idCol, n_tokens, log_w, key), key
    * round-6, ordered by nothing in particular (the SELECTION is the
    * output; ordering is the caller's). */
  def dsirResample(docs: DataFrame, idCol: String, textCol: String,
                   target: DataFrame, targetTextCol: String, n: Int,
                   buckets: Int = 4096): DataFrame = {
    require(n >= 1, s"dsirResample needs n >= 1, got $n")
    val w = dsirLogWeights(docs, idCol, textCol, target, targetTextCol, buckets)
    gumbelTopN(w, idCol, n)
  }

  /** Per-doc features for the quality classifier: the
    * [[docBucketCounts]] hashed-unigram multiplicities plus one BIAS
    * row (bucket −1, multiplicity 1) per doc, so the intercept rides
    * the same join/aggregate machinery as every other weight. */
  private[graft] def logregFeatures(docs: DataFrame, idCol: String,
                                    textCol: String,
                                    buckets: Int): DataFrame =
    docBucketCounts(docs, idCol, textCol, buckets)
      .unionByName(docs.select(col(idCol).cast("long").as("doc_id"),
        lit(-1L).as("bucket"), lit(1L).as("m")))

  /** Trainable QUALITY CLASSIFIER fit (fastText-shaped; Joulin et al.
    * 2016's bag-of-hashed-features linear model, the architecture
    * behind the CCNet / FineWeb quality filters): full-batch logistic
    * regression over [[logregFeatures]], trained with `rounds` fixed
    * gradient steps — deterministic end to end, so the TRAINING LOOP
    * itself sits under a hash gate (the kMeans / bpeMerges / pageRank
    * fixed-round discipline), where an SGD trainer with shuffled
    * minibatches never could.
    *
    * Fixed-point discipline (the dsirRatioTable precedent): weights
    * are 1e-9 longs; per-doc margins are EXACT integer dot products
    * Σ m·w (one partial-agg shuffle over per-doc bucket rows); the
    * only floats are the sigmoid and the per-round step, each rounded
    * back to fixed point by Spark SQL `round` (HALF_UP — matching the
    * oracle's `round`) the moment they appear:
    *
    *   g_d  = round((y_d − σ(margin_d / 1e9)) · 1e9)
    *   Δw_b = round(lr · Σ_d g_d · m_db / N)
    *
    * Scale shape: each round is one broadcast join of the (B+1)-row
    * weight table + two bounded aggregates; the weight table is a
    * model artifact (the k-centroid collect precedent) — corpus rows
    * never leave the cluster. Features are HASHED buckets, so model
    * size is a parameter regardless of corpus scale. Output:
    * (bucket, w_fixed) — the trained model, |B|+1 rows at most. */
  def logregFit(docs: DataFrame, idCol: String, textCol: String,
                labelCol: String, buckets: Int = 1024, rounds: Int = 3,
                lr: Double = 1.0): DataFrame = {
    require(rounds >= 1, s"logregFit needs rounds >= 1, got $rounds")
    val spark = docs.sparkSession
    import spark.implicits._
    val feats = logregFeatures(docs, idCol, textCol, buckets)
      .localCheckpoint() // reused every round: one corpus pass, not `rounds`
    val labels = docs.select(col(idCol).cast("long").as("doc_id"),
      col(labelCol).cast("long").as("y")).localCheckpoint()
    val n = labels.count()
    require(n > 0, "logregFit: empty corpus")
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to rounds) {
      val wDf = w.toSeq.toDF("bucket", "wf")
      val margins = feats.join(broadcast(wDf), Seq("bucket"), "left")
        .groupBy("doc_id")
        .agg(sum(col("m") * coalesce(col("wf"), lit(0L))).as("mf"))
      val deltas = labels.join(margins, Seq("doc_id"), "left")
        .select(col("doc_id"),
          round((col("y").cast("double")
              - lit(1.0) / (lit(1.0)
                + exp(-(coalesce(col("mf"), lit(0L)).cast("double") / lit(1e9)))))
            * lit(1e9))
            .cast("bigint").as("g"))
        .join(feats, Seq("doc_id"))
        .groupBy("bucket")
        .agg(round(lit(lr) * sum(col("g") * col("m")).cast("double") / lit(n))
          .cast("bigint").as("delta"))
        .collect() // (B+1)-row model-artifact fetch per round
      deltas.foreach { row =>
        val b = row.getAs[Long]("bucket")
        w = w.updated(b, w(b) + row.getAs[Long]("delta"))
      }
    }
    w.toSeq.toDF("bucket", "w_fixed")
  }

  /** Score a corpus under a trained [[logregFit]] model: per-doc
    * σ(Σ m·w / 1e9), round-6 — the serve path (broadcast (B+1)-row
    * model, one per-doc aggregate, no refit). Compose with
    * [[graft.operators.Eval.rocAuc]] to close the train→score→AUC
    * loop in-engine. Docs with no tokens still carry the bias row, so
    * every doc scores. */
  def logregScore(docs: DataFrame, idCol: String, textCol: String,
                  weights: DataFrame, buckets: Int): DataFrame = {
    val scored = logregFeatures(docs, idCol, textCol, buckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy("doc_id")
      .agg(sum(col("m") * coalesce(col("w_fixed"), lit(0L))).as("mf"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol),
        round(lit(1.0) / (lit(1.0)
            + exp(-(coalesce(col("mf"), lit(0L)).cast("double") / lit(1e9)))), 6)
          .as("score"))
  }

  /** The Gumbel-max draw over a scored frame (idCol, n_tokens,
    * log_w): top-`n` by log_w + Gumbel(md5('g#' || id)) — shared by
    * [[dsirResample]] and the stored-model bench shape so the draw
    * arithmetic exists once. */
  def gumbelTopN(weights: DataFrame, idCol: String, n: Int): DataFrame = {
    val u = (expr(Sketch.md5Hash60Sql(
      s"concat('g#', cast($idCol as string))")) + lit(1L))
      .cast("double") / lit(Sketch.M60)
    weights.withColumn("__key", col("log_w") + -log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col("n_tokens"), col("log_w"),
        round(col("__key"), 6).as("key"))
  }
}
