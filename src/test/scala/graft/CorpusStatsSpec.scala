package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.vocab]], [[TextAnalysis.lengthHistogram]] and
  * [[TextAnalysis.piiStats]] against hand-computed expectations.
  */
class CorpusStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("vocab ranks by frequency with lexicographic ties, coverage accumulates to 1") {
    val spark2 = spark
    import spark2.implicits._
    // counts: b=4, a=3, c=2, d=1 → total 10
    val docs = Seq(
      1L -> "a b b c",
      2L -> "b a d",
      3L -> "a b c").toDF("doc_id", "text")
    val all = TextAnalysis.vocab(docs, "doc_id", "text", topK = 10)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("cnt"),
                 r.getAs[Int]("rank"), r.getAs[Double]("share"),
                 r.getAs[Double]("cum_share")))
    assert(all.toSeq === Seq(
      ("b", 4L, 1, 0.4, 0.4),
      ("a", 3L, 2, 0.3, 0.7),
      ("c", 2L, 3, 0.2, 0.9),
      ("d", 1L, 4, 0.1, 1.0)))
    // topK cuts the tail but keeps the FULL-corpus denominator
    val top2 = TextAnalysis.vocab(docs, "doc_id", "text", topK = 2)
      .orderBy("rank").collect()
    assert(top2.length === 2)
    assert(top2.last.getAs[Double]("cum_share") === 0.7)
  }

  test("vocab tie-break is lexicographic, making rank deterministic") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(1L -> "z y x", 2L -> "x y z").toDF("doc_id", "text")
    val terms = TextAnalysis.vocab(docs, "doc_id", "text", topK = 3)
      .orderBy("rank").collect().map(_.getAs[String]("term")).toSeq
    assert(terms === Seq("x", "y", "z")) // all cnt=2 → lexicographic
  }

  test("lengthHistogram buckets by floor(tokens/bucket)*bucket") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> (1 to 3).map(_ => "w").mkString(" "),   // 3 tokens  → 0
      2L -> (1 to 49).map(_ => "w").mkString(" "),  // 49 tokens → 0
      3L -> (1 to 50).map(_ => "w").mkString(" "),  // 50 tokens → 50
      4L -> (1 to 120).map(_ => "w").mkString(" ")  // 120       → 100
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lengthHistogram(docs, "text", bucketSize = 50)
      .collect().map(r => r.getAs[Long]("bucket_lo") -> r.getAs[Long]("docs"))
      .toMap
    assert(got === Map(0L -> 2L, 50L -> 1L, 100L -> 1L))
  }

  test("dedupSegments keeps first occurrences in order, handles empties") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      1L -> "x y x z y",
      2L -> "a a a",
      3L -> "",
      4L -> "unique words only here").toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextAnalysis.dedupSegments("text", sep = " ").as("d"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the first-occurrence ORDER is the load-bearing claim — the
    // q_dedup_segments oracle replays it with an explicit min-pos sort
    assert(got === Map(1L -> "x y z", 2L -> "a", 3L -> "",
      4L -> "unique words only here"))
  }

  test("tokenEntropy: hand-computed H and TTR; repetitive doc scores below diverse doc") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> "a a a a",          // H = 0, ttr = 0.25
      2L -> "a b c d",          // H = ln 4, ttr = 1
      3L -> "a a b b",          // H = ln 2, ttr = 0.5
      4L -> "spam spam spam spam spam spam spam eggs").toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((4L, 1L, 0.25, 0.0)))
    assert(got(2L)._3 === 1.0)
    assert(math.abs(got(2L)._4 - math.log(4)) < 1e-6)
    assert(math.abs(got(3L)._4 - math.log(2)) < 1e-6)
    // 7/8 spam: H = ln8 − (7·ln7)/8 ≈ 0.3768
    assert(math.abs(got(4L)._4 - (math.log(8) - 7 * math.log(7) / 8)) < 1e-6)
    assert(got(4L)._4 < got(2L)._4, "repetition scores below diversity")
  }

  test("noveltyScore: first-introduction by min doc id, exact fractions, order matters") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> "a b c d",   // grams "a b c","b c d" — both novel → 1.0
      2L -> "a b c e",   // "a b c" seen, "b c e" novel → 0.5
      3L -> "a b c d").toDF("doc_id", "text") // both seen → 0.0
    val got = TextAnalysis.noveltyScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((2L, 0L, 0.0)))
    // total novel grams across the corpus == the distinct gram count
    assert(got.values.map(_._2).sum === 3L)
  }

  test("mergeable datasheet: merge(evens, odds) equals the one-pass sheet; merge is commutative") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("source") -> r.toSeq).toMap
    val full = rows(TextAnalysis.finalizeSourceStats(
      TextAnalysis.sourceStatsMergeable(docs, "doc_id", "source", "text")))
    val e = TextAnalysis.sourceStatsMergeable(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "source", "text")
    val o = TextAnalysis.sourceStatsMergeable(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "source", "text")
    val merged = rows(TextAnalysis.finalizeSourceStats(
      TextAnalysis.mergeSourceStats(e, o)))
    assert(merged === full, "associative sums fold to the one-pass sheet")
    val swapped = rows(TextAnalysis.finalizeSourceStats(
      TextAnalysis.mergeSourceStats(o, e)))
    assert(swapped === full, "merge is commutative")
  }

  test("sourcePercentiles: nearest-rank on known lengths; null/empty text pins to 0") {
    val spark2 = spark
    import spark2.implicits._
    // source A: docs of 1..10 tokens → n=10; nearest-rank (ceil(p·n))
    // gives p25=3 (cum 3·100 ≥ 10·25; len 2 has 200 < 250), p50=5,
    // p75=8 (len 7: 700 < 750), p90=9
    val a = (1 to 10).map(k => ("A", ("w " * k).trim))
    // source B: constant length 4 → every percentile is 4
    val b = (1 to 5).map(_ => ("B", "a b c d"))
    val docs = (a ++ b).toDF("source", "text")
    val got = TextAnalysis.sourcePercentiles(docs, "source", "text")
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("docs"), r.getAs[Long]("p25"), r.getAs[Long]("p50"),
          r.getAs[Long]("p75"), r.getAs[Long]("p90")))).toMap
    assert(got("A") === ((10L, 3L, 5L, 8L, 9L)))
    assert(got("B") === ((5L, 4L, 4L, 4L, 4L)))
    // p100 is the max; p1 is the min (rank ceil(n/100) clamps to 1)
    val edge = TextAnalysis.sourcePercentiles(docs, "source", "text",
        percents = Seq(1, 100))
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("p1"), r.getAs[Long]("p100")))).toMap
    assert(edge("A") === ((1L, 10L)))
  }

  test("length histograms merge losslessly: percentiles from merged deltas == one-pass") {
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    import org.apache.spark.sql.functions.col
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getAs[String]("source") -> r.toSeq).toMap
    val full = rows(TextAnalysis.sourcePercentiles(docs, "source", "text"))
    val e = TextAnalysis.lengthHistogramBySource(
      docs.filter(col("doc_id") % 2 === 0), "source", "text")
    val o = TextAnalysis.lengthHistogramBySource(
      docs.filter(col("doc_id") % 2 === 1), "source", "text")
    val merged = rows(TextAnalysis.percentilesFromHistogram(
      TextAnalysis.mergeLengthHistograms(e, o), "source"))
    assert(merged === full,
      "histogram is a lossless summary: merged deltas re-cut exactly")
    val swapped = rows(TextAnalysis.percentilesFromHistogram(
      TextAnalysis.mergeLengthHistograms(o, e), "source"))
    assert(swapped === full, "merge is commutative")
  }

  test("termDrift: hand-computed TV; identical corpora drift 0; disjoint corpora drift 1") {
    val spark2 = spark
    import spark2.implicits._
    def docs(texts: String*) = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    // A = "a a b", B = "a b b": per-term cross = |cnt_a·3 − cnt_b·3|
    // = 3 for both terms → drift 3/9 each, TV = 6/(2·9) = 0.333333
    val got = TextAnalysis.termDrift(docs("a a b"), docs("a b b"), "text")
      .collect().map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("cnt_a"), r.getAs[Long]("cnt_b"),
          r.getAs[Double]("drift"), r.getAs[Double]("total_tv")))).toMap
    assert(got === Map(
      "a" -> ((2L, 1L, 0.333333, 0.333333)),
      "b" -> ((1L, 2L, 0.333333, 0.333333))))
    // identical corpora: zero everywhere
    val same = TextAnalysis.termDrift(docs("p q r"), docs("p q r"), "text")
      .collect()
    assert(same.forall(r => r.getAs[Double]("drift") == 0.0
      && r.getAs[Double]("total_tv") == 0.0))
    // disjoint corpora: TV = 1 exactly
    val disj = TextAnalysis.termDrift(docs("x y"), docs("z w"), "text")
      .collect()
    assert(disj.head.getAs[Double]("total_tv") === 1.0)
    assert(disj.length === 4, "every term of either side appears")
    // topK cut is deterministic and keeps the corpus-wide TV
    val cut = TextAnalysis.termDrift(docs("x y"), docs("z w"), "text", topK = 2)
      .collect()
    assert(cut.length === 2)
    assert(cut.head.getAs[Double]("total_tv") === 1.0,
      "total_tv is corpus-wide, not top-K-wide")
    assert(cut.map(_.getAs[String]("term")).toSeq ===
      cut.map(_.getAs[String]("term")).toSeq.sorted,
      "tie-break by term makes the cut deterministic")
  }

  /** Naive reference BPE over a word-count dict: count all adjacent
    * pairs (overlaps included), merge the (count desc, pair asc) best
    * leftmost-non-overlapping, repeat. */
  private def refBpe(words: Map[String, Long],
                     merges: Int): Seq[(Int, String, String, Long)] = {
    var seqs: Map[String, Vector[String]] =
      words.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach { case (w, cnt) =>
        seqs(w).sliding(2).foreach {
          case Vector(a, b) => pc((a, b)) = pc.getOrElse((a, b), 0L) + cnt
          case _ =>
        }
      }
      if (pc.nonEmpty) {
        val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
        out += ((rank, l, r, c))
        seqs = seqs.view.mapValues { s =>
          val b = Vector.newBuilder[String]; var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += l + r; i += 2
            } else { b += s(i); i += 1 }
          }
          b.result()
        }.toMap
      }
    }
    out.result()
  }

  test("bpeMerges: classic corpus merges by hand; matches the naive reference; hierarchical") {
    val spark2 = spark
    import spark2.implicits._
    // the textbook BPE corpus: low ×5, lower ×2, newest ×6, widest ×3
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val got = TextAnalysis.bpeMerges(docs, "text", merges = 6)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_cnt"))).toSeq
      .sortBy(_._1)
    val words = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    assert(got === refBpe(words, 6), "Spark loop must equal the naive reference")
    // hand-check the first merges: es (9 = 6+3), then est (the merged
    // symbol participates — the loop is genuinely hierarchical)
    assert(got(0) === ((1, "e", "s", 9L)))
    assert(got(1) === ((2, "es", "t", 9L)))
    // the greedy invariant: each round's winning count never exceeds
    // the previous round's (new pairs created by a merge inherit at
    // most its count)
    assert(got.map(_._4).sliding(2).forall(p => p(0) >= p(1)))
    // determinism under repartition
    val again = TextAnalysis.bpeMerges(docs.repartition(5), "text", merges = 6)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_cnt"))).toSeq.sortBy(_._1)
    assert(again === got)
    // fewer possible merges than asked-for: single repeated char word
    val tiny = Seq((1L, "aa aa")).toDF("doc_id", "text")
    val t = TextAnalysis.bpeMerges(tiny, "text", merges = 8).collect()
    assert(t.length === 1, "loop must stop when no pairs remain")
    assert((t(0).getAs[String]("left"), t(0).getAs[String]("right")) === (("a", "a")))
  }

  test("bpeMerges handles back-to-back occurrences and runs exactly (the banana pin)") {
    val spark2 = spark
    import spark2.implicits._
    // back-to-back merged pairs and same-symbol runs are where a
    // single-delimiter replace silently under-merges ('banana'
    // merging (a,n) must yield BOTH an-merges); the two-marker
    // wrapping makes one replace pass exact — pin against the naive
    // reference on a corpus built of exactly these shapes
    val docs = Seq(
      (1L, "banana banana banana bananana aaaa aaaa naan"),
      (2L, "banana anana nananana aa aa aa")).toDF("doc_id", "text")
    val words = docs.collect().flatMap(_.getString(1).split(' '))
      .filter(_.nonEmpty).groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val got = TextAnalysis.bpeMerges(docs, "text", merges = 8)
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_cnt"))).toSeq.sortBy(_._1)
    assert(got === refBpe(words, 8))
    // spot-pin the killer cases: (n,a) counts ALL overlapping
    // adjacencies (18), and round 2 merges na+na — possible only if
    // BOTH 'an' merges in 'banana' happened in round 1's single pass
    assert(got(0) === ((1, "n", "a", 18L)))
    assert(got(1) === ((2, "na", "na", 10L)))
  }

  /** Naive one-pass-in-rank-order merge application — the encode
    * semantics bpeWordPieces promises (each merge applied once,
    * leftmost-non-overlapping, in rank order: the trainer's own
    * rewrite sequence). */
  private def refApply(word: String, merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(word.map(_.toString).toVector) { case (s0, (l, r)) =>
      val b = Vector.newBuilder[String]; var i = 0
      while (i < s0.length) {
        if (i + 1 < s0.length && s0(i) == l && s0(i + 1) == r) {
          b += l + r; i += 2
        } else { b += s0(i); i += 1 }
      }
      b.result()
    }

  test("bpeWordPieces: encode == the trainer's final segmentation; OOV by the same rule") {
    val spark2 = spark
    import spark2.implicits._
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val table = TextAnalysis.bpeMerges(docs, "text", merges = 6)
    val ms = table.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // corpus words + OOV words (never trained): same one-pass rule
    val words = Seq("low", "lower", "newest", "widest",
      "lowest", "wes", "x", "estest").toDF("w")
    val got = TextAnalysis.bpeWordPieces(words, "w", table)
      .collect().map(r => r.getAs[String]("w") ->
        (r.getAs[scala.collection.Seq[String]]("pieces").toVector,
          r.getAs[Int]("n_pieces"))).toMap
    for (w <- Seq("low", "lower", "newest", "widest", "lowest", "wes", "x", "estest")) {
      val exp = refApply(w, ms)
      assert(got(w)._1 === exp, s"pieces of '$w'")
      assert(got(w)._2 === exp.length, s"n_pieces of '$w'")
    }
    // chunkSize=1 (a localCheckpoint between every merge — the 50k-
    // merge production path) must be bit-identical to one chunk
    val chunked = TextAnalysis.bpeWordPieces(words, "w", table, chunkSize = 1)
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[scala.collection.Seq[String]]("pieces").toVector).toMap
    assert(chunked === got.view.mapValues(_._1).toMap)
  }

  test("bpeTokenCounts: per-doc sums under the trained vocab; empty docs count 0") {
    val spark2 = spark
    import spark2.implicits._
    val corpus = Seq(
      (1L, "low low lower newest"),
      (2L, "widest newest newest"),
      (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val table = TextAnalysis.bpeMerges(corpus, "text", merges = 4)
    val ms = table.orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    val got = TextAnalysis.bpeTokenCounts(corpus, "doc_id", "text", table)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def n(w: String) = refApply(w, ms).length.toLong
    assert(got(1L) === 2 * n("low") + n("lower") + n("newest"))
    assert(got(2L) === n("widest") + 2 * n("newest"))
    assert(got(3L) === 0L, "empty text counts 0")
    assert(got(4L) === 0L, "null text counts 0")
    assert(got.size === 4, "every doc present")
  }

  test("piiStats counts emails, phones and urls, zero on clean text") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      1L -> "contact bob@example.com or sue@test.org today",
      2L -> "call 555-123-4567 or 555.987.6543 now",
      3L -> "see https://example.com/x and http://a.b/c?d=1",
      4L -> "perfectly clean text with no identifiers"
    ).toDF("doc_id", "text")
    val got = TextAnalysis.piiStats(docs, "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("emails"), r.getAs[Int]("phones"),
          r.getAs[Int]("urls")))).toMap
    assert(got(1L) === ((2, 0, 0)))
    assert(got(2L) === ((0, 2, 0)))
    assert(got(3L) === ((0, 0, 2)))
    assert(got(4L) === ((0, 0, 0)))
  }
}
