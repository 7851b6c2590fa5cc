package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Randomized pin of [[TextAnalysis.chunkTokens]]' index arithmetic
  * against a direct Scala reference: for ANY (doc length, window,
  * stride), chunk i must be exactly `toks.slice(i·stride,
  * i·stride + window)` with ⌈len/stride⌉ chunks — the invariant the
  * hand-picked cases in ChunkTokensSpec sample and the q_chunk
  * DuckDB oracle replays. One seeded batch evaluated through a
  * single Spark job (many (doc, window, stride) configs per run)
  * so the distributed path is the thing tested.
  */
class ChunkPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def reference(toks: Vector[String], window: Int,
                        stride: Int): Seq[(Int, String, Int)] = {
    val nChunks = math.ceil(toks.size.toDouble / stride).toInt.max(1)
    (0 until nChunks).map { i =>
      val c = toks.slice(i * stride, i * stride + window)
      (i, c.mkString(" "), c.size)
    }
  }

  test("chunkTokens == slice reference for random lengths/windows/strides") {
    val genCase = for {
      len <- Gen.choose(1, 120)
      window <- Gen.choose(1, 40)
      stride <- Gen.choose(1, 40)
    } yield (len, window, stride)

    // each sample is one tiny Spark job — 60 seeded configs keeps the
    // 3-int space well covered at ~seconds of wall time
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(60)
      .withInitialSeed(Seed(7L))
    val prop = Prop.forAll(genCase) { case (len, window, stride) =>
      val toks = (1 to len).map(i => s"t$i").toVector
      val expected = reference(toks, window, stride)
      val spark2 = spark
      import spark2.implicits._
      val got = TextAnalysis.chunkTokens(
          Seq((1L, toks.mkString(" "))).toDF("doc_id", "text"),
          "doc_id", "text", window, stride)
        .collect()
        .map(r => (r.getAs[Int]("chunk_idx"), r.getAs[String]("chunk"),
                   r.getAs[Int]("n_tokens")))
        .sortBy(_._1).toSeq
      got == expected
    }
    val res = SCTest.check(params, prop)
    assert(res.passed, s"chunk property failed: ${res.status}")
  }
}
