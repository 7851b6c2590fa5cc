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

  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
                     target: DataFrame, targetTextCol: String,
                     buckets: Int = 4096,
                     source: DataFrame = null,
                     sourceTextCol: String = null): DataFrame = {
    val src = Option(source).getOrElse(docs)
    val stc = Option(sourceTextCol).getOrElse(textCol)
    val ratios = dsirRatioTable(target, targetTextCol, src, stc, buckets)
    val perDoc = docs
      .select(col(idCol), explode(expr(
        s"filter(split(coalesce($textCol, ''), ' '), x -> x != '')")).as("tok"))
      .select(col(idCol), expr(bucketExpr(buckets)).as("bucket"))
      .groupBy(col(idCol), col("bucket")).agg(count(lit(1)).as("m"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("m")).as("n_tokens"), sum(col("m") * col("lr")).as("__s"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(coalesce(col("__s"), lit(0L)).cast("double") / lit(1e9), 6)
          .as("log_w"))
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
    val u = (expr(Sketch.md5Hash60Sql(
      s"concat('g#', cast($idCol as string))")) + lit(1L))
      .cast("double") / lit(Sketch.M60)
    w.withColumn("__key", col("log_w") + -log(-log(u)))
      .orderBy(col("__key").desc, col(idCol))
      .limit(n)
      .select(col(idCol), col("n_tokens"), col("log_w"),
        round(col("__key"), 6).as("key"))
  }
}
