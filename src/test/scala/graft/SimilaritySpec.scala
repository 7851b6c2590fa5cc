package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity
import graft.queries.SimilarityPack

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark
  private def emb = Tables.embeddings(spark, SparkSuite.sf0001)

  test("brute-force top-k is ordered and unit-normalized sims are in [-1,1]") {
    val rows = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      SimilarityPack.queryVec, 10).collect()
    assert(rows.length === 10)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.sameElements(sims.sorted.reverse))
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("IVF top-k with nprobe=3 recalls most of the exact top-k") {
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      SimilarityPack.queryVec, 10).collect().map(_.getAs[Long]("vec_id")).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", "label",
      SimilarityPack.queryVec, 10, nprobe = 3).collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall with nprobe=3/10 clusters")
  }

  test("embedding near-dup pairs: all candidates truly above threshold (exact verify)") {
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.40)
      .collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getAs[Double]("cos") >= 0.40))
    // symmetric dedup: a<b ordering, no self-pairs
    assert(pairs.forall(r => r.getAs[Long]("id_a") < r.getAs[Long]("id_b")))
  }

  test("dot/cosine column helpers agree with manual computation") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 1.0f, 2.0f)))
      .toDF("a", "b")
    val d = df.select(Similarity.dot("a", "b").as("d")).head().getDouble(0)
    assert(d === 8.0)
    val c = df.select(Similarity.cosine("a", "b").as("c")).head().getDouble(0)
    assert(math.abs(c - 8.0 / 9.0) < 1e-12)
  }
}
