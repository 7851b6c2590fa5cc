package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** The BPE out-of-vocab contract
  * ([[TextAnalysis.bpeWordIdsWithVocab]] /
  * [[TextAnalysis.bpeIdSequencesWithVocab]] /
  * [[TextAnalysis.bpeDecodeWithVocab]]): encoding a corpus DISJOINT
  * from the vocab's training corpus maps every unseen character to
  * the reserved id |vocab|, counts the fallback uses, and round-trips
  * back to the original with exactly the OOV characters masked —
  * plus the gate-precondition canary (x/z outside the corpus
  * alphabet).
  */
class BpeOovSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("gate canary: 'x' and 'z' are outside the corpus alphabet") {
    // q_bpe_oov plants OOV via translate(text, 'ae', 'xz'); if a
    // regenerated corpus ever contains x or z, the plant stops being
    // out-of-vocab and the gate's fallback tier goes unexercised —
    // surface that here instead of silently weakening the gate
    val chars = Tables.documents(spark, SparkSuite.sf001)
      .select(explode(expr(
        "transform(sequence(1, length(text)), i -> substr(text, i, 1))"))
        .as("ch"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(!chars.contains("x") && !chars.contains("z"),
      "corpus alphabet now contains x/z — pick new OOV plant chars for q_bpe_oov")
  }

  test("cross-corpus encode: unseen characters get the reserved |vocab| id, counted per doc") {
    val spark2 = spark
    import spark2.implicits._
    val train = Seq(1L -> "ab ab cd", 2L -> "ab cd cd ab").toDF("doc_id", "text")
    val eval = Seq(10L -> "ab xd", 11L -> "zz", 12L -> "cd cd")
      .toDF("doc_id", "text")
    val mt = TextAnalysis.bpeMerges(train, "text", merges = 2)
    val vocab = TextAnalysis.bpeVocab(train, "text", mt)
    val vocabRows = vocab.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val unkId = vocabRows.size
    // base alphabet a,b,c,d (binary-sorted ids 0..3) + merge products
    assert(Set("a", "b", "c", "d").subsetOf(vocabRows.keySet))
    assert(!vocabRows.keySet.exists(p => p.contains("x") || p.contains("z")))

    val got = TextAnalysis.bpeIdSequencesWithVocab(
        eval, "doc_id", "text", vocab, mt)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[scala.collection.Seq[Int]]("ids").toList,
          r.getAs[Long]("n_unk")))).toMap
    // "xd": merges never touch x, so pieces are the replayed rewrite
    // of x,d — x is OOV → unkId; every unk id is exactly unkId
    assert(got(11L)._1 === Seq(unkId, unkId))
    assert(got(11L)._2 === 2L)
    assert(got(10L)._2 === 1L)
    assert(got(10L)._1.contains(unkId))
    assert(got(12L)._2 === 0L)
    assert(!got(12L)._1.contains(unkId))
    // no id anywhere exceeds the reserved one
    got.values.foreach { case (ids, _) => ids.foreach(i => assert(i <= unkId)) }
  }

  test("encoding the training corpus under its own vocab matches bpeIdSequences with zero unks") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Tables.documents(spark, SparkSuite.sf0001)
    val mt = TextAnalysis.bpeMerges(docs, "text", merges = 4)
    val vocab = TextAnalysis.bpeVocab(docs, "text", mt)
    val self = TextAnalysis.bpeIdSequences(docs, "doc_id", "text", mt)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Int]]("ids").toList)
      .toMap
    val stored = TextAnalysis.bpeIdSequencesWithVocab(
        docs, "doc_id", "text", vocab, mt)
      .collect()
    assert(stored.forall(_.getAs[Long]("n_unk") === 0L))
    assert(stored.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[scala.collection.Seq[Int]]("ids").toList).toMap === self)
  }

  test("cross-corpus round trip: decode == original with exactly the OOV characters masked") {
    val spark2 = spark
    import spark2.implicits._
    val train = Seq(1L -> "the cat sat", 2L -> "the hat").toDF("doc_id", "text")
    val eval = Seq(
      10L -> "the xat",       // one OOV char inside a word
      11L -> "zz xz",         // all-OOV words
      12L -> "the the  cat",  // in-vocab, double space (normalization)
      13L -> "")               // wordless
      .toDF("doc_id", "text")
    val mt = TextAnalysis.bpeMerges(train, "text", merges = 3)
    val vocab = TextAnalysis.bpeVocab(train, "text", mt)
    val got = TextAnalysis.bpeDecodeWithVocab(
        eval, "doc_id", "text", vocab, mt)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("decoded"), r.getAs[Boolean]("ok")))).toMap
    assert(got(10L) === (("the �at", true)))
    assert(got(11L) === (("�� ��", true)))
    assert(got(12L) === (("the the cat", true)))
    assert(got(13L) === (("", true)))
  }
}
