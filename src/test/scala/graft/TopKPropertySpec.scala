package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Property pin for the salted two-phase top-k: over randomized data
  * (group cardinalities, heavy value duplication, multi-column
  * groups) and a spread of (k, saltFactor) configs — including the
  * degenerate saltFactor=1 and a factor far above any group size —
  * the forced salted form must return EXACTLY the single-window rows
  * and ranks. Samples are generated seeded (reproducible) and
  * batched: all samples ride in ONE frame with the sample id as an
  * extra group column, so each config costs two jobs, not two per
  * sample. Order always carries the unique per-row id tiebreaker —
  * the documented total-order requirement; without it BOTH forms are
  * nondeterministic and equality is not defined. */
class TopKPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  // one sample: up to 120 rows over up to 5 groups, values drawn from
  // a tiny range so ties and duplicate (grp, value) pairs are common.
  // Rows are (sample, grp, value, id) tuples — a nested case class
  // cannot get a Spark encoder from inside a test class.
  private def sampleGen(sample: Int): Gen[List[(Int, Int, Int, Long)]] =
    for {
      n <- Gen.choose(0, 120)
      groups <- Gen.choose(1, 5)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, groups - 1)
        v <- Gen.choose(0, 6)
      } yield (g, v))
    } yield rows.zipWithIndex.map { case ((g, v), i) =>
      (sample, g, v, sample * 1000L + i)
    }

  test("saltedTopKForced == single window over randomized inputs and configs") {
    val s = spark
    import s.implicits._
    val samples = (0 until 12).flatMap { i =>
      sampleGen(i)(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error("gen failed"))
    }
    assert(samples.nonEmpty)
    val df = samples.toDF("sample", "grp", "value", "id")
    val order = Seq(col("value").desc, col("id").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("sample"), col("grp")).orderBy(order: _*)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Int]("sample"), r.getAs[Int]("grp"), r.getAs[Long]("id"),
       r.getAs[Int]("rn"))
    for ((k, f) <- Seq((1, 4), (3, 16), (5, 1), (8, 64))) {
      val plain = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).collect().map(key).toSet
      val salted = Skew.saltedTopKForced(df, Seq("sample", "grp"), order,
        k = k, saltFactor = f).collect().map(key).toSet
      assert(salted === plain, s"diverged at k=$k saltFactor=$f")
    }
  }
}
