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
