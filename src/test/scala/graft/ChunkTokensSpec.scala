package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.chunkTokens]]: chunk boundaries, overlap, trailing
  * partials, and the null/empty edge — the exact semantics the
  * q_chunk DuckDB oracle replays.
  */
class ChunkTokensSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def chunksOf(text: String, window: Int, stride: Int): Seq[(Int, String, Int)] = {
    val spark2 = spark
    import spark2.implicits._
    TextAnalysis.chunkTokens(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", window, stride)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk"),
                 r.getAs[Int]("n_tokens"))).toSeq
  }

  test("overlapping windows: starts every stride, trailing chunk short") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    // ceil(10/3) = 4 chunks, starts 0/3/6/9, window 4
    assert(chunksOf(text, window = 4, stride = 3) === Seq(
      (0, "t1 t2 t3 t4", 4),
      (1, "t4 t5 t6 t7", 4),
      (2, "t7 t8 t9 t10", 4),
      (3, "t10", 1)))
  }

  test("window == stride partitions the doc exactly, no overlap") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val out = chunksOf(text, window = 4, stride = 4)
    assert(out.map(_._2).mkString(" ") === text) // concatenation = doc
    assert(out.map(_._3) === Seq(4, 4, 1))
  }

  test("consecutive chunks overlap by exactly window - stride tokens") {
    val text = (1 to 50).map(i => s"x$i").mkString(" ")
    val out = chunksOf(text, window = 16, stride = 10)
    out.sliding(2).foreach {
      case Seq((_, a, an), (_, b, _)) if an == 16 =>
        val overlap = a.split(' ').takeRight(6).toSeq
        assert(b.split(' ').take(6).toSeq === overlap)
      case _ => // trailing short chunk: no full-overlap contract
    }
    // every token appears in at least one chunk
    val covered = out.flatMap(_._2.split(' ')).toSet
    assert(covered === text.split(' ').toSet)
  }

  test("null and empty text yield ONE empty chunk, never an error") {
    // the single-space tokenizer maps '' to [''] — one empty token,
    // hence one chunk of one (empty) token; null coalesces to ''
    assert(chunksOf("", window = 8, stride = 8) === Seq((0, "", 1)))
    val spark2 = spark
    import spark2.implicits._
    val out = TextAnalysis.chunkTokens(
        Seq((1L, null: String)).toDF("doc_id", "text"),
        "doc_id", "text", window = 8, stride = 8)
      .collect()
    assert(out.length === 1 && out.head.getAs[String]("chunk") === "")
  }

  test("doc shorter than one window: a single partial chunk") {
    assert(chunksOf("a b c", window = 100, stride = 50) ===
      Seq((0, "a b c", 3)))
  }
}
