package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{DataSelection, Eval}

/** The trainable quality classifier ([[DataSelection.logregFit]] /
  * [[DataSelection.logregScore]]): train→score→AUC separation on a
  * planted two-population corpus, fit determinism across repeated
  * fits, and the bias-only scoring contract for wordless docs.
  */
class QualityClfSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  /** Two planted populations with a few shared function words: the
    * fastText-paper shape (class-indicative content words + common
    * glue) a hashed-bag linear model must separate. */
  private def plantedDocs = {
    val spark2 = spark
    import spark2.implicits._
    (1L to 200L).map { i =>
      val y = (i % 2).toInt
      val text =
        if (y == 1) s"the clean prose alpha beta gamma delta word$i of quality"
        else s"the spam junk zork blargh noise click$i of doom"
      (i, text, y)
    }.toDF("doc_id", "text", "y")
  }

  test("train -> score -> AUC separates a planted two-population corpus") {
    val docs = plantedDocs
    val w = DataSelection.logregFit(docs, "doc_id", "text", "y",
      buckets = 128, rounds = 3, lr = 1.0)
    val scored = DataSelection.logregScore(docs, "doc_id", "text", w,
        buckets = 128)
      .join(docs.select(col("doc_id"), col("y")), "doc_id")
    val auc = Eval.rocAuc(scored, "score", "y")
      .collect()(0).getAs[Double]("auc")
    assert(auc > 0.95, s"classifier failed to separate: AUC $auc")
    // direction sanity: positives score higher on average
    val means = scored.groupBy("y").agg(avg(col("score")).as("ms"))
      .collect().map(r => r.getAs[Int]("y") -> r.getAs[Double]("ms")).toMap
    assert(means(1) > means(0))
  }

  test("fit is deterministic: two fits yield identical fixed-point weights") {
    val docs = plantedDocs
    def fit() = DataSelection.logregFit(docs, "doc_id", "text", "y",
        buckets = 64, rounds = 2, lr = 0.5)
      .collect().map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("w_fixed"))
      .toMap
    assert(fit() === fit())
  }

  test("wordless docs score through the bias row alone") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (1L, "alpha beta", 1), (2L, "zork junk", 0),
      (3L, "", 1), (4L, null.asInstanceOf[String], 0))
      .toDF("doc_id", "text", "y")
    val w = DataSelection.logregFit(docs, "doc_id", "text", "y",
      buckets = 32, rounds = 2, lr = 1.0)
    val biasW = w.filter(col("bucket") === -1L)
      .collect()(0).getAs[Long]("w_fixed")
    val scored = DataSelection.logregScore(docs, "doc_id", "text", w,
        buckets = 32)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score"))
      .toMap
    assert(scored.size === 4)
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-(biasW.toDouble / 1e9))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scored(3L) === expect)
    assert(scored(4L) === expect)
  }
}
