package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Pins the BPE ID layer ([[TextAnalysis.bpeVocab]] /
  * [[TextAnalysis.bpeWordIds]] / [[TextAnalysis.bpeIdSequences]] /
  * [[TextAnalysis.bpePackedIdBins]]) — the piece→id assignment rules,
  * the sequence order, agreement with the piece-count layer, and the
  * packed-bin payloads' equality with the packSequences assignment.
  * The staged-CTE oracles (q_bpe_vocab_ids / q_bpe_ids /
  * q_pack_bpe_ids) hash-pin the same semantics cross-engine; this
  * spec pins the RULES on corpora small enough to reason about. */
class BpeIdsSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  import spark.implicits._

  // "banana bandana" corpus: merges create multi-char pieces, and the
  // run-merge case (an an in banana) is exercised
  private lazy val docs = Seq(
    (0L, "banana banana band"),
    (1L, "bandana na"),
    (2L, ""),              // wordless doc -> empty sequence
    (3L, "na na banana")
  ).toDF("doc_id", "text")
  private lazy val merges = TextAnalysis.bpeMerges(docs, "text", merges = 4)
  private lazy val vocab =
    TextAnalysis.bpeVocab(docs, "text", merges).collect()
      .map(r => r.getAs[String]("piece") -> r.getAs[Int]("id")).toMap

  test("vocab: base alphabet sorted first, products in rank order, bijective") {
    val alphabet = Seq("a", "b", "d", "n")
    alphabet.zipWithIndex.foreach { case (c, i) =>
      assert(vocab(c) === i, s"base char $c must get id $i (sorted tier)")
    }
    // ids are a bijection: distinct, contiguous from 0
    val ids = vocab.values.toSeq.sorted
    assert(ids === (0 until vocab.size))
    // every merge product is present, and product ids follow rank
    // order strictly after the base tier
    val ranked = merges.orderBy("rank").collect()
      .map(r => r.getAs[String]("left") + r.getAs[String]("right"))
    val productIds = ranked.filterNot(alphabet.contains).map(vocab)
    assert(productIds.sameElements(productIds.sorted) &&
      productIds.forall(_ >= alphabet.size),
      s"product ids must ascend with creation rank: $vocab")
  }

  test("word ids match word pieces elementwise, in order") {
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val pieces = TextAnalysis.bpeWordPieces(words, "w", merges)
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[scala.collection.Seq[String]]("pieces").toSeq).toMap
    val ids = TextAnalysis.bpeWordIds(words, "w",
        TextAnalysis.bpeVocab(docs, "text", merges), merges)
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[scala.collection.Seq[Int]]("ids").toSeq).toMap
    assert(ids.keySet === pieces.keySet)
    ids.foreach { case (w, idSeq) =>
      assert(idSeq === pieces(w).map(vocab),
        s"id sequence for '$w' must be its pieces mapped through the vocab")
    }
  }

  test("doc sequences: word order preserved, empty doc empty, counts agree") {
    val seqs = TextAnalysis.bpeIdSequences(docs, "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[scala.collection.Seq[Int]]("ids").toSeq, r.getAs[Int]("n_ids"))).toMap
    assert(seqs.keySet === Set(0L, 1L, 2L, 3L))
    assert(seqs(2L)._1 === Seq.empty[Int] && seqs(2L)._2 === 0,
      "wordless doc must emit an EMPTY array, not null")
    seqs.foreach { case (_, (ids, n)) => assert(ids.length === n) }
    // n_ids == bpeTokenCounts for every doc (the count layer and the
    // emission layer must agree — packing depends on it)
    val cnts = TextAnalysis.bpeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("bpe_tokens")).toMap
    seqs.foreach { case (d, (_, n)) => assert(n.toLong === cnts(d),
      s"doc $d: sequence length $n != bpe_tokens ${cnts(d)}") }
    // word order: doc 3 = "na na banana" — its sequence is the
    // word-id concatenation in document order
    val wordIds = TextAnalysis.bpeWordIds(
        docs.select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")) > 0), "w",
        TextAnalysis.bpeVocab(docs, "text", merges), merges)
      .collect().map(r => r.getAs[String]("w") ->
        r.getAs[scala.collection.Seq[Int]]("ids").toSeq).toMap
    assert(seqs(3L)._1 ===
      wordIds("na") ++ wordIds("na") ++ wordIds("banana"))
  }

  test("packed bins: assignment matches packSequences; payload is the stream") {
    val seqs = TextAnalysis.bpeIdSequences(docs, "doc_id", "text", merges)
    val bins = TextAnalysis.bpePackedIdBins(docs, "doc_id", "text", merges,
      ctxTokens = 4, shards = 2).collect()
    // the inlined window must reproduce packSequences' assignment
    val packed = TextAnalysis.packSequences(seqs, "doc_id", "text",
        ctxTokens = 4, shards = 2, tokensCol = Some(col("n_ids").cast("long")))
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val fromBins = bins.map(r => ((r.getAs[Long]("shard"), r.getAs[Long]("bin")),
      r.getAs[Long]("n_docs"))).toMap
    assert(fromBins === packed,
      "bin membership must equal the packSequences assignment")
    // per shard, concatenating the bins in bin order reproduces the
    // shard's full id stream (docs in doc_id order)
    val seqMap = seqs.collect().map(r => r.getAs[Long]("doc_id") ->
      r.getAs[scala.collection.Seq[Int]]("ids").toSeq).toMap
    (0L to 1L).foreach { shard =>
      val stream = seqMap.keys.toSeq.sorted.filter(_ % 2 == shard)
        .flatMap(seqMap)
      val rebuilt = bins.filter(_.getAs[Long]("shard") == shard)
        .sortBy(_.getAs[Long]("bin"))
        .flatMap(_.getAs[scala.collection.Seq[Int]]("ids").toSeq).toSeq
      assert(rebuilt === stream, s"shard $shard stream mismatch")
      val nIds = bins.filter(_.getAs[Long]("shard") == shard)
        .map(_.getAs[Long]("n_ids")).sum
      assert(nIds === stream.length.toLong)
    }
  }
}
