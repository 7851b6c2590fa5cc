package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

/** [[Sampling.temperatureMix]] — the n^(1/T) flattening rule:
  * T = 1 degenerates to uniform subsampling, large T lifts rare
  * sources to keep-everything, budgets nest, selection is
  * deterministic.
  */
class TemperatureMixSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def corpus(nA: Int, nB: Int) = {
    val spark2 = spark
    import spark2.implicits._
    ((1 to nA).map(i => (i.toLong, "A")) ++
      (1 to nB).map(i => ((1000 + i).toLong, "B")))
      .toDF("doc_id", "source")
  }

  private def kept(df: org.apache.spark.sql.DataFrame, t: Double,
                   f: Double): Set[Long] =
    Sampling.temperatureMix(df, "doc_id", "source", t, f)
      .collect().map(_.getAs[Long]("doc_id")).toSet

  test("T = 1 is natural-distribution subsampling: rate f for every source") {
    val docs = corpus(90, 10)
    val got = kept(docs, t = 1.0, f = 0.4)
    // same membership as a source-blind u < f cut
    val expected = docs
      .withColumn("u", (expr(graft.operators.Sketch.md5Hash60Sql(
        "concat('t#', cast(doc_id as string))")) + lit(1L))
        .cast("double") / lit(graft.operators.Sketch.M60))
      .filter(col("u") < 0.4)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got === expected)
    // and both sources are actually represented
    assert(got.exists(_ <= 90L) && got.exists(_ > 1000L))
  }

  test("large T clamps the rare source at keep-everything") {
    val docs = corpus(90, 10)
    // near-uniform shares: B's p·f·N = ~25 > 10 docs → clamp at 1.0
    val got = kept(docs, t = 1e6, f = 0.5)
    assert((1 to 10).map(i => (1000 + i).toLong).toSet.subsetOf(got))
    // A is subsampled well below natural
    assert(got.count(_ <= 90L) < 45)
  }

  test("budgets nest: a bigger fraction keeps a superset") {
    val docs = corpus(60, 20)
    val small = kept(docs, t = 2.0, f = 0.3)
    val big = kept(docs, t = 2.0, f = 0.6)
    assert(small.subsetOf(big))
    assert(small.size < big.size)
  }

  test("selection is repartition-invariant") {
    val docs = corpus(64, 16)
    val a = kept(docs, t = 2.0, f = 0.5)
    val b = kept(docs.repartition(13), t = 2.0, f = 0.5)
    assert(a === b)
  }
}
