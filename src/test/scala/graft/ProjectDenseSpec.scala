package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** [[Similarity.projectDense]]: components equal the per-plane dot
  * products over the seeded family, and their signs are exactly
  * [[Similarity.hyperplaneBits]] — the projection and the LSH
  * signature are the same geometry.
  */
class ProjectDenseSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private val dim = 16
  private val outDim = 6
  private val seed = 7L

  private def vecs: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(99)
    (1L to 40L).map(id => id -> Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
  }

  test("components equal left-fold double dot products, rounded to 6") {
    val spark2 = spark
    import spark2.implicits._
    val data = vecs
    val planes = Similarity.hyperplanes(dim, outDim, seed)
    val got = Similarity.projectDense(data.toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim, outDim, seed)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Double]]("proj").toSeq).toMap
    data.foreach { case (id, v) =>
      val expected = planes.map { p =>
        // same shape as the native graft_dot: per-element float→double
        // cast, sequential left-fold accumulation
        val d = v.zip(p).foldLeft(0d) { case (acc, (x, pi)) =>
          acc + x.toDouble * pi
        }
        BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
      assert(got(id) === expected, s"vec $id")
    }
  }

  test("projection signs ARE the hyperplane LSH bits") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.DotProduct.register(spark)
    val df = vecs.toDF("vec_id", "embedding")
    val proj = Similarity.projectDense(df, "vec_id", "embedding",
      dim, outDim, seed)
    val bits = df.select(col("vec_id"),
      Similarity.hyperplaneBits("embedding", dim, outDim, seed).as("bits"))
    val joined = proj.join(bits, "vec_id").collect()
    assert(joined.length === vecs.size)
    joined.foreach { r =>
      val p = r.getAs[scala.collection.Seq[Double]]("proj")
      val b = r.getAs[scala.collection.Seq[Int]]("bits")
      p.lazyZip(b).foreach { (x, bit) =>
        // rounding to 6 decimals can flip the sign only within 5e-7 of
        // zero — skip that measure-zero band instead of asserting it
        if (math.abs(x) > 1e-5) assert((x >= 0) === (bit == 1))
      }
    }
  }
}
