package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.DataSelection

/** [[DataSelection]] (DSIR-shaped importance resampling): identity
  * and separation properties of the log-weights, determinism of the
  * Gumbel-max draw.
  */
class DsirSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("target == source makes every log-weight exactly zero") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(1L -> "a b c", 2L -> "d e", 3L -> "a a a f")
      .toDF("doc_id", "text")
    val w = DataSelection.dsirLogWeights(docs, "doc_id", "text",
      docs, "text", buckets = 64).collect()
    assert(w.length === 3)
    w.foreach(r => assert(r.getAs[Double]("log_w") === 0.0))
  }

  test("target-like docs outweigh off-target docs") {
    val spark2 = spark
    import spark2.implicits._
    val docs = ((1L to 20L).map(i => i -> "alpha beta gamma delta") ++
      (21L to 40L).map(i => i -> "omega psi chi phi")).toDF("doc_id", "text")
    val target = Seq(100L -> "alpha beta alpha gamma delta beta")
      .toDF("doc_id", "text")
    val w = DataSelection.dsirLogWeights(docs, "doc_id", "text",
      target, "text", buckets = 256).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("log_w")).toMap
    assert(w(1L) > w(21L))
    // and the resample picks target-like docs first
    val picked = DataSelection.dsirResample(docs, "doc_id", "text",
      target, "text", n = 10, buckets = 256).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(picked.count(_ <= 20L) > picked.count(_ > 20L))
  }

  test("empty docs carry zero tokens and neutral weight") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val target = Seq(9L -> "a").toDF("doc_id", "text")
    val w = DataSelection.dsirLogWeights(docs, "doc_id", "text",
      target, "text", buckets = 32).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("log_w"))).sortBy(_._1)
    assert(w(1) === ((2L, 0L, 0.0)))
    assert(w(2) === ((3L, 0L, 0.0)))
  }

  test("bucket table is bounded by the buckets parameter") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 50L).map(i => i -> s"tok$i other$i more$i")
      .toDF("doc_id", "text")
    val bc = DataSelection.bucketCounts(docs, "text", buckets = 8).collect()
    assert(bc.length <= 8)
    assert(bc.map(_.getAs[Long]("bucket")).forall(b => b >= 0 && b < 8))
    // counts conserve the token stream
    assert(bc.map(_.getAs[Long]("c")).sum === 150L)
  }

  test("resample is deterministic, exact-n, and repartition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (1L to 80L).map(i =>
      i -> (if (i % 3 == 0) "aa bb cc" else "xx yy zz ww")).toDF("doc_id", "text")
    val target = Seq(0L -> "aa bb aa cc bb").toDF("doc_id", "text")
    def draw(d: org.apache.spark.sql.DataFrame) =
      DataSelection.dsirResample(d, "doc_id", "text", target, "text",
        n = 25, buckets = 128).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("key")))
        .sortBy(_._1).toSeq
    val a = draw(docs)
    val b = draw(docs.repartition(13))
    assert(a.length === 25)
    assert(a === b)
  }
}
