package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Conjunctive keyword search over the corpus ("docs containing ALL
  * of these terms") — two plans for the same semantics, chosen by
  * whether the corpus has been indexed.
  *
  * [[searchAllTerms]] — the scan form: one narrow pass, no shuffle.
  * A cheap substring `contains` prefilter runs FIRST (it compiles to
  * a `StringContains` data-source pushdown, so row groups whose
  * min/max or dictionary exclude the literal never decompress), then
  * the exact whitespace-token membership check on survivors.
  * Substring containment over-matches token membership ("scan" is a
  * substring of "scans"), never under-matches — a superset prefilter,
  * so the composition is exact.
  *
  * [[buildPostings]] / [[searchPostings]] — the index form, the same
  * storage-layout trick as the ANN bucket store
  * (`Similarity.lshTopKBucketed`): distinct (term, doc) postings
  * written `putPartitioned` by a term-hash bucket. A query then reads
  * ONLY the ≤ |terms| matching bucket directories (planning-time
  * `PartitionFilters`, pinned in SearchSpec) — at 100 TB the scan
  * form reads the whole corpus per query, the index form reads
  * |terms|/buckets of the (much smaller) posting table, which is the
  * right side of the trade the moment queries outnumber corpus
  * rewrites. The intersection is a groupBy-count over posting rows of
  * the probed terms only (≤ doc-frequency rows per term), never a
  * full-vocabulary shuffle.
  *
  * Both forms return the same rows (SearchSpec pins scan == index ==
  * brute force), and both replay in DuckDB as per-term
  * `list_contains` predicates (q_index_search / q_index_stored).
  */
object Search {

  private def tokenArr(textCol: String): Column = split(col(textCol), " ")

  /** Exact conjunctive match, scan form: `idCol` of every row whose
    * space-tokenized `textCol` contains EVERY term in `terms`. */
  def searchAllTerms(df: DataFrame, idCol: String, textCol: String,
                     terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "searchAllTerms needs at least one term")
    require(terms.forall(t => t.nonEmpty && !t.contains(" ")),
      s"terms must be non-empty single tokens, got $terms")
    val prefilter = terms.map(t => col(textCol).contains(t)).reduce(_ && _)
    val exact = terms.map(t => array_contains(tokenArr(textCol), t))
      .reduce(_ && _)
    df.filter(prefilter && exact).select(col(idCol))
  }

  /** Exact phrase search: `idCol` of every row whose space-tokenized
    * `textCol` contains the words of `phrase` CONSECUTIVELY. Same
    * two-phase shape as [[searchAllTerms]]: the raw-substring
    * `contains(phrase)` prefilter pushes to the scan (a superset —
    * "xspark hash" contains the chars but not the token sequence),
    * then the exact check slides an n-word window over the token
    * array (`transform(sequence(...))`, codegen'd, zero shuffle). */
  def searchPhrase(df: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    require(words.nonEmpty && words.forall(_.nonEmpty),
      s"searchPhrase needs a non-empty phrase, got '$phrase'")
    if (words.size == 1) searchAllTerms(df, idCol, textCol, words)
    else {
      val n = words.size
      val joined = words.mkString(" ")
      val grams = expr(graft.functions.Let.let1(s"split($textCol, ' ')", "toks")(
        s"""CASE WHEN size(toks) < $n THEN cast(array() as array<string>)
           |ELSE transform(sequence(0, size(toks) - $n),
           |  i -> concat_ws(' ', slice(toks, i + 1, $n))) END""".stripMargin))
      df.filter(col(textCol).contains(joined) &&
          array_contains(grams, lit(joined)))
        .select(col(idCol))
    }
  }

  /** BM25-ranked retrieval: the top-`k` documents for a bag-of-terms
    * query, scored by Okapi BM25 (same formula and constants as
    * `TextAnalysis.bm25Top`, which ranks terms WITHIN a doc — this
    * ranks DOCS for a query).
    *
    * Shuffle discipline at corpus scale: everything wide is bounded
    * by the CANDIDATE set (docs containing ≥1 query term — found by
    * a substring-prefilter scan whose `contains` pushes down), never
    * the corpus. The corpus-wide inputs are two scalar aggregates
    * (doc count N, total token count — map-side partials, 1-row
    * result); tf/df/dl are all computed on candidates only. No
    * full-vocabulary explode-shuffle happens anywhere — compare
    * `termStatsJoined`, which must pay it because it scores every
    * term.
    *
    * Determinism (the oracle contract): tf, df, dl, N, Σdl are exact
    * integers, so each per-(doc,term) score is one deterministic
    * double expression; the per-doc sum runs over fixed-point BIGINT
    * contributions (round(score·10⁹)) exactly like
    * `unigramCrossEntropy`, so no double ever crosses a shuffle —
    * bit-stable under any partitioning, and DuckDB replays it
    * (q_search_ranked). Terms absent from the corpus contribute
    * nothing (no tf rows), matching the oracle's inner joins. */
  def bm25Search(df: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int = 10,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Search needs at least one term")
    require(queryTerms.forall(t => t.nonEmpty && !t.contains(" ")),
      s"terms must be non-empty single tokens, got $queryTerms")
    require(k >= 1, s"bm25Search needs k >= 1, got $k")
    val terms = queryTerms.distinct
    val base = df.filter(col(textCol).isNotNull)
    // corpus-wide scalars: one narrow map-side agg, no explode
    val totals = base.agg(
      count(lit(1)).as("n"),
      sum(size(tokenArr(textCol)).cast("long")).as("total_tokens"))
    val cand = base
      .filter(terms.map(t => col(textCol).contains(t)).reduce(_ || _))
      .select(col(idCol).as("doc_id"), col(textCol).as("__text"))
    val tf = cand
      .select(col("doc_id"), explode(tokenArr("__text")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = cand.select(col("doc_id"),
      size(tokenArr("__text")).cast("long").as("dl"))
    val contrib = tf.join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .withColumn("avgdl",
        col("total_tokens").cast("double") / col("n").cast("double"))
      .withColumn("idf", log(lit(1d) +
        (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("c", round(col("idf") * (col("tf") * lit(k1 + 1d)) /
        (col("tf") + lit(k1) *
          (lit(1d - b) + lit(b) * col("dl") / col("avgdl"))) * lit(1e9))
        .cast("bigint"))
    contrib.groupBy("doc_id")
      .agg(round(sum(col("c")).cast("double") / lit(1e9), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Distinct (term, doc) postings with the term-hash partition
    * column `tb` the index layout partitions by. */
  def buildPostings(df: DataFrame, idCol: String, textCol: String,
                    buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buildPostings needs buckets >= 1, got $buckets")
    df.select(col(idCol).as("doc"), explode(tokenArr(textCol)).as("term"))
      .filter(col("term") =!= "").distinct()
      .withColumn("tb", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
  }

  /** Write the posting index into `cat` under `name`, partitioned by
    * term bucket — the one-time cost that makes [[searchPostings]] a
    * pruned read. */
  def storePostings(cat: Catalog, name: String, df: DataFrame, idCol: String,
                    textCol: String, buckets: Int = 64): Unit =
    cat.putPartitioned(name, buildPostings(df, idCol, textCol, buckets), "tb")

  /** Exact conjunctive match against a stored posting index: reads
    * only the term buckets of `terms` (partition-pruned), intersects
    * by doc. `buckets` must equal the build-time value (the bucket of
    * a term is a pure function of term and bucket count). */
  def searchPostings(postings: DataFrame, terms: Seq[String],
                     buckets: Int = 64, docCol: String = "doc"): DataFrame = {
    require(terms.nonEmpty, "searchPostings needs at least one term")
    val distinctTerms = terms.distinct
    // bucket-of-term must equal the build side's xxhash64 exactly, so
    // compute it with the same builtin over a LocalRelation (a
    // driver-local |terms|-row evaluation, no cluster job)
    val spark = postings.sparkSession
    import spark.implicits._
    val termBuckets = distinctTerms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      .collect().map(_.getInt(0)).toIndexedSeq.distinct
    postings
      .filter(col("tb").isin(termBuckets: _*) &&
        col("term").isin(distinctTerms: _*))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("nt"))
      .filter(col("nt") === distinctTerms.size)
      .select(col("doc").as(docCol))
  }
}
