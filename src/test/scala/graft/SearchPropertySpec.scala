package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Search

/** Seeded randomized agreement between the three search plans and
  * plain-Scala references — the SelectRegexPropertySpec pattern:
  * generate small corpora with a skewed vocabulary (so matches are
  * neither empty nor universal), then assert the distributed plans
  * equal the obvious driver-side computation. */
class SearchPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val vocab = Vector("spark", "hash", "window", "scan", "agg",
    "row", "batch", "merge", "sort", "key", "value", "table")

  private def corpus(seed: Long, nDocs: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(12)
      val words = Seq.fill(len)(vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
  }

  test("conjunctive scan and posting-index agree with the reference over seeds") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1L to 5L) {
      val rows = corpus(seed, 120)
      val df = rows.toDF("doc_id", "text")
      val rnd = new scala.util.Random(seed * 31)
      val terms = Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
        .distinct
      val expect = rows.collect {
        case (id, text) if terms.forall(text.split(" ").contains(_)) => id
      }.toSet
      val scan = Search.searchAllTerms(df, "doc_id", "text", terms)
        .collect().map(_.getLong(0)).toSet
      val idx = Search.searchPostings(
        Search.buildPostings(df, "doc_id", "text", buckets = 8),
        terms, buckets = 8, docCol = "doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(scan === expect, s"scan form diverged at seed $seed terms $terms")
      assert(idx === expect, s"index form diverged at seed $seed terms $terms")
    }
  }

  test("phrase search agrees with the sliding-window reference over seeds") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 1L to 5L) {
      val rows = corpus(seed, 120)
      val df = rows.toDF("doc_id", "text")
      val rnd = new scala.util.Random(seed * 17)
      val n = 2 + rnd.nextInt(2)
      val phrase = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      val expect = rows.collect {
        case (id, text)
          if text.split(" ").sliding(n).exists(_.mkString(" ") == phrase) => id
      }.toSet
      val got = Search.searchPhrase(df, "doc_id", "text", phrase)
        .collect().map(_.getLong(0)).toSet
      assert(got === expect, s"phrase diverged at seed $seed phrase '$phrase'")
    }
  }

  test("bm25Search agrees with the driver-side scorer over seeds") {
    val spark2 = spark
    import spark2.implicits._
    for (seed <- 11L to 13L) {
      val rows = corpus(seed, 80)
      val df = rows.toDF("doc_id", "text")
      val terms = Seq("spark", "hash")
      val docs = rows.toMap.view.mapValues(_.split(" ").toSeq).toMap
      val n = docs.size
      val avgdl = docs.values.map(_.size).sum.toDouble / n
      def score(id: Long): Option[Double] = {
        val toks = docs(id)
        val contribs = terms.flatMap { t =>
          val tf = toks.count(_ == t)
          if (tf == 0) None else {
            val dfq = docs.values.count(_.contains(t))
            val idf = math.log(1d + (n - dfq + 0.5) / (dfq + 0.5))
            Some(math.round(idf * (tf * 2.2) /
              (tf + 1.2 * (0.25 + 0.75 * toks.size / avgdl)) * 1e9))
          }
        }
        if (contribs.isEmpty) None
        else Some(BigDecimal(contribs.sum.toDouble / 1e9)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val expect = docs.keys.toSeq.flatMap(id => score(id).map(id -> _))
        .sortBy { case (id, s) => (-s, id) }.take(10)
      val got = Search.bm25Search(df, "doc_id", "text", terms, k = 10)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toSeq
      assert(got === expect, s"bm25 diverged at seed $seed")
    }
  }
}
