package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** The native NFC expression against java.text.Normalizer ground
  * truth, plus the pipeline normalizeText chain and the codegen-stage
  * assertion ([[graft.functions.DotProduct]]'s discipline). */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def nfcOf(ss: String*): Seq[String] = {
    val s2 = spark
    import s2.implicits._
    NfcNormalize.register(spark)
    ss.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "t")
      .selectExpr("i", "graft_nfc(t) AS n")
      .orderBy("i").collect().map(_.getString(1)).toSeq
  }

  test("decomposed accents compose; precomposed and ASCII pass through unchanged") {
    val decomposedE = "cafe\u0301"  // e + combining acute U+0301
    val precomposedE = "café"
    val got = nfcOf(decomposedE, precomposedE, "plain ascii", "")
    assert(got(0) === precomposedE, "NFC composes e+◌́ to é")
    assert(got(1) === precomposedE)
    assert(got(2) === "plain ascii")
    assert(got(3) === "")
    // idempotent, and equal to the JDK normalizer on a unicode mix
    val mix = "Ångström 😀 ṩ"
    val expected = java.text.Normalizer.normalize(mix,
      java.text.Normalizer.Form.NFC)
    assert(nfcOf(mix).head === expected)
    assert(nfcOf(expected).head === expected)
  }

  test("null propagates; non-string input fails analysis") {
    val s2 = spark
    import s2.implicits._
    NfcNormalize.register(spark)
    val got = Seq((1, Option.empty[String]), (2, Some("x"))).toDF("i", "t")
      .selectExpr("graft_nfc(t) AS n").collect().map(_.getString(0))
    assert(got.toSet === Set(null, "x"))
    val e = intercept[Exception] {
      Seq(1).toDF("i").selectExpr("graft_nfc(i)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("string") ||
      e.getMessage.toLowerCase.contains("data type"))
  }

  test("normalizeText chain: NFC + lowercase + whitespace collapse + trim") {
    val s2 = spark
    import s2.implicits._
    NfcNormalize.register(spark)
    val got = Seq("  Café   du\t\tMONDE \n")
      .toDF("t")
      .select(graft.operators.TextAnalysis.normalizeText("t").as("n"))
      .collect().head.getString(0)
    assert(got === "café du monde")
  }

  test("evaluates inside whole-stage codegen (no fallback)") {
    NfcNormalize.register(spark)
    val plan = Tables.documents(spark, SparkSuite.sf0001)
      .selectExpr("graft_nfc(text) AS n")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [graft_nfc"),
      s"expected the graft_nfc projection inside a codegen stage:\n$plan")
  }
}
