package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.bm25Top]] and [[TextAnalysis.unigramCrossEntropy]]
  * against independent plain-Scala references, plus the determinism
  * property the fixed-point xent design exists for (bit-identical
  * results under any input partitioning).
  */
class TermScoringSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val corpus: Seq[(Long, String)] = Seq(
    1L -> "the cat sat on the mat",
    2L -> "the dog sat on the log",
    3L -> "a cat and a dog",
    4L -> "quantum chromodynamics lattice simulation",
    5L -> "the the the the")

  private def toksOf(t: String): Seq[String] = t.split(' ').toSeq

  test("bm25Top matches a plain-Scala reference implementation") {
    val spark2 = spark
    import spark2.implicits._
    val k1 = 1.2; val b = 0.75; val k = 3
    // independent reference: Maps and explicit loops, no Spark
    val tf: Map[(Long, String), Long] = corpus.flatMap { case (id, t) =>
      toksOf(t).groupBy(identity).map { case (w, g) => (id, w) -> g.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }
    val dl: Map[Long, Long] =
      tf.groupBy(_._1._1).map { case (id, m) => id -> m.values.sum }
    val n = corpus.size.toLong
    val avgdl = dl.values.sum.toDouble / n.toDouble
    val expected = corpus.flatMap { case (id, _) =>
      val scored = tf.collect { case ((`id`, w), f) =>
        val idf = math.log(1d + (n - df(w) + 0.5) / (df(w) + 0.5))
        val score = idf * (f * (k1 + 1d)) /
          (f + k1 * ((1d - b) + b * dl(id) / avgdl))
        (w, BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toSeq.sortBy { case (w, s) => (-s, w) }
      scored.take(k).zipWithIndex.map { case ((w, s), i) => (id, w, s, i + 1) }
    }.toSet
    val got = TextAnalysis.bm25Top(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = k)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
                 r.getAs[Double]("score"), r.getAs[Int]("rn"))).toSet
    assert(got === expected)
  }

  test("bm25Top emits at most k contiguous ranks per doc, scores non-increasing") {
    val spark2 = spark
    import spark2.implicits._
    val rows = TextAnalysis.bm25Top(corpus.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"),
                 r.getAs[Int]("rn")))
      .groupBy(_._1)
    rows.values.foreach { g =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq === (1 to sorted.size))
      assert(sorted.size <= 2)
      assert(sorted.map(_._2).toSeq === sorted.map(_._2).sortBy(-(_: Double)).toSeq)
    }
    assert(rows.keySet === corpus.map(_._1).toSet)
  }

  test("unigramCrossEntropy matches a plain-Scala reference") {
    val spark2 = spark
    import spark2.implicits._
    val cf: Map[String, Long] = corpus.flatMap { case (_, t) => toksOf(t) }
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val total = cf.values.sum.toDouble
    val expected = corpus.map { case (id, t) =>
      val tf = toksOf(t).groupBy(identity).view.mapValues(_.size.toLong)
      val contribs = tf.map { case (w, f) =>
        math.round(f * math.log(cf(w) / total) * 1e9)
      }
      val dl = tf.values.sum
      val x = -(contribs.sum.toDouble / 1e9) / dl.toDouble
      id -> BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = TextAnalysis.unigramCrossEntropy(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(got === expected)
  }

  test("pmiBigrams matches a plain-Scala reference; collocation scores above chance pairs") {
    val spark2 = spark
    import spark2.implicits._
    // "new york" always collocates; "the cat"/"the dog" are chance-ish
    val docs = Seq(
      1L -> "new york is big and the cat sat",
      2L -> "the dog saw new york and the cat",
      3L -> "new york new york the dog ran",
      4L -> "the cat and the dog and new york").toDF("doc_id", "text")
    val got = TextAnalysis.pmiBigrams(docs, "text", minCount = 2L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    // plain-Scala reference over the same streams
    val texts = Seq("new york is big and the cat sat",
      "the dog saw new york and the cat",
      "new york new york the dog ran",
      "the cat and the dog and new york").map(_.split(' ').toSeq)
    val uni = texts.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nUni = texts.map(_.size).sum.toLong
    val big = texts.flatMap(t => t.zip(t.tail))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nBi = texts.map(_.size - 1).sum.toLong
    val expected = big.filter(_._2 >= 2L).map { case ((a, b), cab) =>
      val pmi = math.log((cab.toDouble * nUni * nUni) /
        (nBi.toDouble * uni(a) * uni(b)))
      (a, b) -> ((cab, math.rint(pmi * 1e6) / 1e6))
    }
    assert(got.keySet === expected.keySet)
    expected.foreach { case (k, (c, pmi)) =>
      assert(got(k)._1 === c, s"count mismatch at $k")
      assert(math.abs(got(k)._2 - pmi) < 1e-9, s"pmi mismatch at $k")
    }
    // the true collocation outranks the chance pairs
    assert(got(("new", "york"))._2 > got(("the", "cat"))._2)
    assert(got(("new", "york"))._2 > got(("the", "dog"))._2)
  }

  test("xent orders common-word docs below rare-word docs") {
    val spark2 = spark
    import spark2.implicits._
    val got = TextAnalysis.unigramCrossEntropy(
        corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    // doc 5 (all 'the', the most common term) must be the cheapest;
    // doc 4 (four corpus-unique terms) the most surprising
    assert(got(5L) === got.values.min)
    assert(got(4L) === got.values.max)
  }

  test("xent is bit-identical across input partitionings (fixed-point sum)") {
    val spark2 = spark
    import spark2.implicits._
    // wide deterministic corpus: enough terms per doc that a floating
    // Σ would genuinely wobble across orders
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 200).map(i => s"w$i")
    val big = (1L to 120L).map { id =>
      id -> Seq.fill(80)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    def run(parts: Int): Map[Long, Double] =
      TextAnalysis.unigramCrossEntropy(
          big.toDF("doc_id", "text").repartition(parts), "doc_id", "text")
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    val a = run(1)
    val b = run(7)
    assert(a === b) // exact equality — not approx
  }
}
