package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** Intra-doc repetition score semantics. */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("repetition score: 0 for all-distinct grams, rises with looped phrases") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "one two three four five six"),              // all 3-grams distinct
      (2L, "spam spam spam spam spam spam spam spam"),  // one gram repeated
      (3L, "ab"))                                       // shorter than n
      .toDF("doc_id", "text")
    val out = df.select($"doc_id",
      TextAnalysis.repetitionScore("text", 3).as("r"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("r")).toMap
    assert(out(1L) === 0.0)
    // 6 windows, 1 distinct → 5/6
    assert(math.abs(out(2L) - 5.0 / 6) < 1e-6)
    assert(out(3L) === 0.0, "sub-window docs are one window, zero repetition")
  }
}
