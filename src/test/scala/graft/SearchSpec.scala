package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

class SearchSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def docs = {
    val spark2 = spark
    import spark2.implicits._
    Seq(
      (1L, "spark hash window join"),
      (2L, "spark hash"),                  // missing 'window'
      (3L, "window hash spark"),           // all three, different order
      (4L, "sparkle hashes windows"),      // substrings only, no tokens
      (5L, "spark spark window window hash hash"), // repeats
      (6L, ""),
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
  }

  test("scan form: exact conjunctive token match, not substring match") {
    val got = Search.searchAllTerms(docs, "doc_id", "text",
      Seq("spark", "hash", "window")).collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 5L))
  }

  test("single term, duplicate terms in the query collapse") {
    val got = Search.searchAllTerms(docs, "doc_id", "text", Seq("hash"))
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L, 5L))
    val idx = Search.searchPostings(
      Search.buildPostings(docs, "doc_id", "text", buckets = 8),
      Seq("hash", "hash"), buckets = 8, docCol = "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(idx === Set(1L, 2L, 3L, 5L))
  }

  test("index form equals scan form equals brute force on the corpus table") {
    val real = Tables.documents(spark, SparkSuite.sf0001)
    val terms = Seq("spark", "hash", "window")
    val scan = Search.searchAllTerms(real, "doc_id", "text", terms)
      .collect().map(_.getLong(0)).toSet
    val idx = Search.searchPostings(
      Search.buildPostings(real, "doc_id", "text", buckets = 16),
      terms, buckets = 16, docCol = "doc_id")
      .collect().map(_.getLong(0)).toSet
    val brute = real.filter(terms.map(t =>
        array_contains(split(col("text"), " "), t)).reduce(_ && _))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(scan === brute)
    assert(idx === brute)
    assert(brute.nonEmpty, "probe terms match nothing — dead test")
  }

  test("stored index probe is a partition-pruned read") {
    val real = Tables.documents(spark, SparkSuite.sf0001)
    val root = java.nio.file.Files.createTempDirectory("graft-searchspec")
    try {
      val cat = new graft.catalog.Catalog(spark, root.toString)
      Search.storePostings(cat, "postings", real, "doc_id", "text",
        buckets = 16)
      val probe = Search.searchPostings(cat.get("postings"), Seq("spark"),
        buckets = 16, docCol = "doc_id")
      val p = probe.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters") && p.contains("tb"),
        s"posting probe does not prune partitions:\n$p")
      cat.close()
    } finally graft.catalog.Catalog.deleteRecursively(root)
  }

  test("searchPhrase: consecutive tokens only, not scattered or substring") {
    val spark2 = spark
    import spark2.implicits._
    val d = Seq(
      (1L, "slow hash batch works"),     // exact phrase
      (2L, "slow fast hash batch"),      // scattered — no
      (3L, "a slow hash batch"),         // mid-sentence
      (4L, "xslow hash batch"),          // substring token — no ('xslow')
      (5L, "slow hash"),                 // incomplete
      (6L, "slow hash batch slow hash batch"), // repeated
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Search.searchPhrase(d, "doc_id", "text", "slow hash batch")
      .collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 3L, 6L))
    // single-word phrase degrades to term search
    val one = Search.searchPhrase(d, "doc_id", "text", "hash")
      .collect().map(_.getLong(0)).toSet
    assert(one === Set(1L, 2L, 3L, 4L, 5L, 6L))
  }

  test("searchPhrase equals the scan-the-tokens brute force on the corpus") {
    val real = Tables.documents(spark, SparkSuite.sf0001)
    val phrase = "a agg batch"
    val got = Search.searchPhrase(real, "doc_id", "text", phrase)
      .collect().map(_.getLong(0)).toSet
    val brute = real.collect().filter { r =>
      Option(r.getAs[String]("text")).exists(
        _.split(" ").sliding(3).exists(_.mkString(" ") == phrase))
    }.map(_.getAs[Long]("doc_id")).toSet
    assert(got === brute)
  }

  test("bm25Search matches a driver-side reference on a tiny corpus") {
    val spark2 = spark
    import spark2.implicits._
    val tiny = Seq(
      (1L, "spark spark spark pad pad pad"),
      (2L, "spark hash pad pad pad pad"),
      (3L, "hash hash hash hash pad pad"),
      (4L, "pad pad pad pad pad pad pad pad"),
      (5L, "spark hash spark hash")
    ).toDF("doc_id", "text")
    val got = Search.bm25Search(tiny, "doc_id", "text", Seq("spark", "hash"),
      k = 5).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // reference: same formula, computed directly
    val docs = Map(1L -> "spark spark spark pad pad pad",
      2L -> "spark hash pad pad pad pad",
      3L -> "hash hash hash hash pad pad",
      4L -> "pad pad pad pad pad pad pad pad",
      5L -> "spark hash spark hash").view.mapValues(_.split(" ").toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = {
      val toks = docs(id)
      val contribs = Seq("spark", "hash").flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0) None else {
          val df = docs.values.count(_.contains(t))
          val idf = math.log(1d + (n - df + 0.5) / (df + 0.5))
          Some(math.round(idf * (tf * 2.2) /
            (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl)) * 1e9))
        }
      }
      BigDecimal(contribs.sum.toDouble / 1e9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got.keySet === Set(1L, 2L, 3L, 5L)) // doc 4 matches nothing
    got.foreach { case (id, s) => assert(s === score(id), s"doc $id") }
    // the balanced short doc should rank first
    assert(got(5L) === got.values.max)
  }

  test("bm25Search: absent terms contribute nothing; stable under repartition") {
    val real = Tables.documents(spark, SparkSuite.sf0001)
    def run(df: org.apache.spark.sql.DataFrame, terms: Seq[String]) =
      Search.bm25Search(df, "doc_id", "text", terms, k = 8)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val baseline = run(real, Seq("spark", "hash"))
    assert(baseline === run(real, Seq("spark", "hash", "zzz-not-a-term")))
    assert(baseline === run(real.repartition(13), Seq("spark", "hash")))
    assert(baseline.nonEmpty)
  }

  test("requires reject empty and multi-word terms") {
    intercept[IllegalArgumentException] {
      Search.searchAllTerms(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Search.searchAllTerms(docs, "doc_id", "text", Seq("two words"))
    }
  }
}
