package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** [[Dedup.spanProfile]] — substring-level duplication profiling:
  * hand-checked semantics on a tiny corpus, the short-text clamp, the
  * stride contract, and the gate-corpus oracle preconditions (the
  * q_dedup_spans oracle equates raw-substring grams with
  * pmod(xxhash64) grams, so hash collisions must be absent there).
  */
class SpanProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def profile(rows: Seq[(Long, String)], k: Int = 4,
                      stride: Int = 1): Map[Long, (Long, Long, Double, Int)] = {
    val s = spark
    import s.implicits._
    Dedup.spanProfile(rows.toDF("doc_id", "text"), "doc_id", "text",
        k = k, stride = stride)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Double]("dup_frac"), r.getAs[Int]("flagged"))))
      .toMap
  }

  test("cross-doc duplicated windows are counted per position; within-doc repeats are not dups") {
    val out = profile(Seq(
      1L -> "abcdefghij",   // identical to doc 2: every window duplicated
      2L -> "abcdefghij",
      3L -> "0123456789",   // unique: no window duplicated
      4L -> "XXabcdefgh",   // shares the abcdefgh region at a DIFFERENT offset
      5L -> "qqqqwwwwqqqq", // 'qqqq' repeats only WITHIN this doc: not a dup
    ))
    assert(out(1L) == ((7L, 7L, 1.0, 1)))
    assert(out(2L) == ((7L, 7L, 1.0, 1)))
    assert(out(3L) == ((7L, 0L, 0.0, 0)))
    // doc 4 windows: XXab Xabc abcd bcde cdef defg efgh — the last 5
    // also occur in docs 1/2 (mid-line overlap doc/segment dedup
    // misses); 5/7 rounds to 0.714286, over the 0.5 flag line
    assert(out(4L) == ((7L, 5L, 0.714286, 1)))
    assert(out(5L)._2 == 0L)
  }

  test("texts shorter than k clamp to ONE truncated window, like charShingleHashes") {
    val out = profile(Seq(1L -> "ab", 2L -> "ab", 3L -> "cd"), k = 4)
    assert(out(1L) == ((1L, 1L, 1.0, 1)))
    assert(out(3L) == ((1L, 0L, 0.0, 0)))
  }

  test("stride samples every stride-th start position") {
    // len 10, k 4 -> starts 1..7; stride 2 keeps 1,3,5,7
    val out = profile(Seq(1L -> "abcdefghij", 2L -> "abcdefghij"), stride = 2)
    assert(out(1L)._1 == 4L)
    assert(out(1L)._2 == 4L)
  }

  test("flagFrac compares the ROUNDED dup_frac (the oracle's contract)") {
    val s = spark
    import s.implicits._
    // 3/7 = 0.428571... < 0.5 -> unflagged; threshold 0.4 -> flagged
    val df = Seq(1L -> "abcdefXYZW", 2L -> "abcdefABCD").toDF("doc_id", "text")
    val loose = Dedup.spanProfile(df, "doc_id", "text", k = 4, flagFrac = 0.4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("flagged")).toMap
    val strict = Dedup.spanProfile(df, "doc_id", "text", k = 4, flagFrac = 0.5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("flagged")).toMap
    assert(loose(1L) == 1 && strict(1L) == 0)
  }

  test("spanRuns: one lifted passage vs scattered boilerplate") {
    val s = spark
    import s.implicits._
    val df = Seq(
      1L -> "XXabcdefghYY",  // contains doc 2 verbatim mid-string
      2L -> "abcdefgh",
      3L -> "abcdPPPPefgh",  // shares abcd and efgh, separated
      4L -> "0123456789",    // nothing shared
    ).toDF("doc_id", "text")
    val out = Dedup.spanRuns(df, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("max_run_spans"), r.getAs[Long]("max_run_chars"))))
      .toMap
    // doc 1: dup windows abcd..efgh are 5 consecutive starts — one
    // island; chars (5-1)*1+4 = 8 = |"abcdefgh"|, the lifted passage
    assert(out(1L) == ((5L, 8L)))
    assert(out(2L) == ((5L, 8L)))
    // doc 3: two length-1 islands (abcd, efgh) — scattered, run 1
    assert(out(3L) == ((1L, 4L)))
    assert(out(4L) == ((0L, 0L)))
  }

  test("spanRuns stride converts runs to chars as (run-1)*stride + k") {
    val s = spark
    import s.implicits._
    val df = Seq(1L -> "abcdefghijkl", 2L -> "abcdefghijkl").toDF("doc_id", "text")
    // len 12, k 4 -> starts 1..9; stride 2 samples 1,3,5,7,9 (5 spans,
    // all duplicated): chars = (5-1)*2 + 4 = 12 = whole doc
    val out = Dedup.spanRuns(df, "doc_id", "text", k = 4, stride = 2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("max_run_spans"), r.getAs[Long]("max_run_chars")))).toMap
    assert(out(1L) == ((5L, 12L)))
  }

  test("spanStrip: owners keep their text, non-owners lose exactly the shared region") {
    val s = spark
    import s.implicits._
    val df = Seq(
      1L -> "abcdefghij",    // owner of the shared grams (min id)
      2L -> "abcdefghij",    // full duplicate: stripped to ''
      3L -> "0123456789",    // unshared: untouched
      4L -> "XXabcdefghYY",  // loses the mid-string copy only
    ).toDF("doc_id", "text")
    val out = Dedup.spanStrip(df, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("dropped_chars"))))
      .toMap
    assert(out(1L) == (("abcdefghij", 0L)), "the owner copy must survive")
    assert(out(2L) == (("", 10L)), "a full duplicate strips to empty")
    assert(out(3L) == (("0123456789", 0L)))
    assert(out(4L) == (("XXYY", 8L)), "only the shared abcdefgh region is cut")
    // exactly one copy of the duplicated region survives corpus-wide
    val survivors = out.values.count(_._1.contains("abcdefgh"))
    assert(survivors == 1)
  }

  test("spanStrip: short-text clamp strips whole sub-k duplicates from non-owners") {
    val s = spark
    import s.implicits._
    val df = Seq(1L -> "ab", 2L -> "ab", 3L -> "cd").toDF("doc_id", "text")
    val out = Dedup.spanStrip(df, "doc_id", "text", k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(out == Map(1L -> "ab", 2L -> "", 3L -> "cd"))
  }

  test("spanStrip fuzz: output is an ordered subsequence, owners untouched, drops accounted") {
    val s = spark
    import s.implicits._
    // seeded corpus with planted sharing: random texts over a tiny
    // alphabet (collisions guaranteed) plus exact copies
    val rnd = new scala.util.Random(99)
    def txt(n: Int) = (1 to n).map(_ => "abc" (rnd.nextInt(3))).mkString
    val base = (1L to 30L).map(i => i -> txt(8 + rnd.nextInt(20)))
    val copies = (31L to 40L).map(i => i -> base((i % 30).toInt)._2)
    val rows = base ++ copies
    val df = rows.toDF("doc_id", "text")
    val out = Dedup.spanStrip(df, "doc_id", "text", k = 5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text"), r.getAs[Long]("dropped_chars"))))
      .toMap
    val orig = rows.toMap
    assert(out.keySet == orig.keySet)
    rows.foreach { case (id, t) =>
      val (stripped, dropped) = out(id)
      // dropped_chars is consistent by construction; the load-bearing
      // invariant is the ORDERED-SUBSEQUENCE property: stripping only
      // deletes characters, never reorders or invents them
      assert(dropped == t.length - stripped.length)
      var i = 0
      stripped.foreach { c =>
        i = t.indexOf(c, i)
        assert(i >= 0, s"doc $id: '$stripped' is not a subsequence of '$t'")
        i += 1
      }
    }
    // every dup gram's min-id owner keeps at least its own copy intact:
    // an owner doc that owns ALL its dup grams loses nothing
    val profile = Dedup.spanProfile(df, "doc_id", "text", k = 5)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_spans")).toMap
    val untouched = out.filter(_._2._2 == 0L).keySet
    assert(untouched.nonEmpty, "some doc must be a pure owner or unshared")
    // and total text only shrinks
    assert(rows.map(_._2.length).sum >= out.values.map(_._1.length).sum)
    assert(profile.values.sum > 0, "fuzz corpus must actually contain duplication")
  }

  test("incremental profile: batch windows dup iff the gram is in the corpus index") {
    val s = spark
    import s.implicits._
    val corpusDocs = Seq(10L -> "abcdefghij").toDF("doc_id", "text")
    val idx = Dedup.spanGramIndex(corpusDocs, "doc_id", "text", k = 4)
    val batch = Seq(
      1L -> "abcdefghij",   // fully known to the corpus
      2L -> "0123456789",   // novel
      3L -> "abcd4567",     // one corpus window (abcd), rest novel
      4L -> "0123 0123 01", // repeats WITHIN the batch only: NOT dup here
    ).toDF("doc_id", "text")
    val out = Dedup.spanProfileIncremental(batch, idx, "doc_id", "text", k = 4)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))))
      .toMap
    assert(out(1L) == ((7L, 7L)))
    assert(out(2L) == ((7L, 0L)))
    assert(out(3L) == ((5L, 1L)))
    assert(out(4L)._2 == 0L,
      "within-batch repetition must not count — that is spanProfile's job")
  }

  test("gate-corpus canary: the hashed gram universe is collision-free at sf0.01") {
    // The q_dedup_spans oracle identifies grams by raw substring while
    // spanProfile identifies them by the full 64-bit xxhash64; they
    // agree iff no two distinct substrings collide. Pin it where the
    // hash gate runs — if this ever trips on a regenerated corpus,
    // demote q_dedup_spans to rows-only (guidance mirrors the
    // minhash-margin canary). This canary is what caught the mod-P
    // variant: 31 bits collide by birthday at ~10⁵ grams.
    val docs = Tables.documents(spark, SparkSuite.sf001)
    val grams = docs.select(explode(expr(
      "transform(sequence(1, greatest(length(text) - 19, 1)), i -> substring(text, i, 20))"))
      .as("s")).distinct().persist()
    val nSub = grams.count()
    val nHash = grams.select(expr("xxhash64(s)")).distinct().count()
    grams.unpersist()
    assert(nSub == nHash,
      s"xxhash64 collision among gate char-20-grams ($nSub substrings vs " +
        s"$nHash hashes): demote q_dedup_spans to rows-only")
  }
}
