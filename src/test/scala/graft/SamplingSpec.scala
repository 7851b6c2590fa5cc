package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def corpus = {
    val spark2 = spark
    import spark2.implicits._
    // strata of very different sizes, incl. one smaller than n
    ((1 to 400).map(i => ("big", i.toLong)) ++
      (401 to 430).map(i => ("mid", i.toLong)) ++
      Seq(("tiny", 431L), ("tiny", 432L)) :+ ((null: String), 433L))
      .toDF("src", "id")
  }

  test("exactly n per stratum; smaller strata return whole") {
    val got = Sampling.stratifiedSample(corpus, "src", "id", n = 10)
    val sizes = got.groupBy("src").count().collect()
      .map(r => Option(r.getString(0)).getOrElse("NULL") -> r.getLong(1)).toMap
    assert(sizes === Map("big" -> 10L, "mid" -> 10L, "tiny" -> 2L, "NULL" -> 1L))
  }

  test("deterministic and partition-invariant: same rows after repartition") {
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "src", "id", n = 7)
        .select("id").collect().map(_.getLong(0)).toSet
    val base = ids(corpus)
    assert(base === ids(corpus.repartition(13)))
    assert(base === ids(corpus.repartition(3).sortWithinPartitions("id")))
  }

  test("incremental stability: a sampled row stays sampled when unrelated rows arrive") {
    val spark2 = spark
    import spark2.implicits._
    // hash-rank selection is content-determined, but the CUT moves as
    // a stratum grows: rows can fall OUT of the top-n, never jump
    // over a still-present better-ranked row. The sample of a grown
    // corpus must be a subset-compatible re-rank: every kept row of
    // the old sample that is still in the new sample keeps its
    // relative order, and the new sample never contains a row the old
    // corpus had but ranked below an evicted old member.
    val grown = corpus.union(
      (5000 to 5100).map(i => ("big", i.toLong)).toDF("src", "id"))
    val oldBig = Sampling.stratifiedSample(corpus, "src", "id", n = 10)
      .filter(col("src") === "big").select("id").collect().map(_.getLong(0)).toSet
    val newBig = Sampling.stratifiedSample(grown, "src", "id", n = 10)
      .filter(col("src") === "big").select("id").collect().map(_.getLong(0)).toSet
    // new members are either old members or newly-arrived rows —
    // an untouched old row can't ENTER the sample by someone else arriving
    assert(newBig.forall(id => oldBig.contains(id) || id >= 5000))
  }

  test("tokenBudgetSample: inclusive prefix rule per stratum, nulls read as 0") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      ("a", 1L, 10), ("a", 2L, 10), ("a", 3L, 10), ("a", 4L, 10),
      ("b", 5L, 100), ("c", 6L, 1)
    ).toDF("src", "id", "tok")
    val got = Sampling.tokenBudgetSample(df, "src", "id", col("tok"),
        Map("a" -> 25L, "b" -> 50L), defaultBudget = 1000L)
      .select("id").collect().map(_.getLong(0)).toSet
    // stratum a: hash order determines WHICH 2 of the 4 docs fit the
    // 25-token budget (10+10=20 <= 25, +10 would be 30) — assert the
    // prefix property against the same hash order computed directly
    val order = df.filter(col("src") === "a")
      .withColumn("k", md5(concat(col("src"), lit("#"), col("id").cast("string"))))
      .orderBy("k", "id").select("id").collect().map(_.getLong(0))
    assert(got.intersect(Set(1L, 2L, 3L, 4L)) === order.take(2).toSet)
    assert(!got.contains(5L)) // 100 > 50: first doc already over budget
    assert(got.contains(6L))  // default budget admits it
    // zero tokens never consume budget; sample is repartition-stable
    val withNull = df.withColumn("tok",
      when(col("id") === 1L, lit(null)).otherwise(col("tok")))
    val a = Sampling.tokenBudgetSample(withNull, "src", "id", col("tok"),
      Map.empty, 20L).select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.tokenBudgetSample(withNull.repartition(7), "src", "id",
      col("tok"), Map.empty, 20L).select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }

  test("weightedSample: exact size, deterministic, E-S key math, weight-proportional odds") {
    val s = spark
    import s.implicits._
    // 1000 rows, weight = 1 except ids 1..20 get weight 50
    val df = (1L to 1000L).map(i => (i, if (i <= 20) 50.0 else 1.0))
      .toDF("id", "w")
    def sample(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, "id", col("w"), n = 100)
        .select("id").collect().map(_.getLong(0)).toSet
    val got = sample(df)
    assert(got.size === 100, "exactly n rows")
    assert(got === sample(df.repartition(11)), "partition-invariant")
    // plain-Scala replay of the key: top-100 by ln(u)/w desc
    def fold60(sv: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 15), 16)
    }
    val expected = (1L to 1000L).map { i =>
      val u = (fold60(s"w#$i").toDouble + 1) / 1152921504606846976.0d
      val w = if (i <= 20) 50.0 else 1.0
      i -> math.log(u) / w
    }.sortBy { case (i, k) => (-k, i) }.take(100).map(_._1).toSet
    assert(got === expected, "keys replay the E-S scheme exactly")
    // heavy rows are strongly over-represented vs their 2% population
    assert(got.count(_ <= 20L) >= 10,
      s"weight-50 rows under-sampled: ${got.count(_ <= 20L)}/20")
    // zero/null weights are excluded entirely
    val withZero = (1L to 50L).map(i => (i, if (i % 2 == 0) 0.0 else 1.0))
      .toDF("id", "w")
    assert(Sampling.weightedSample(withZero, "id", col("w"), n = 50)
      .collect().map(_.getLong(0)).forall(_ % 2 == 1))
  }

  test("epochShuffle: deterministic, partition-invariant, epoch-decorrelated, shard = key prefix") {
    val s = spark
    import s.implicits._
    val docs = (1L to 500L).toDF("id")
    def order(df: org.apache.spark.sql.DataFrame, epoch: Int) =
      Sampling.epochShuffle(df, "id", epoch, shards = 8)
        .select("shard", "sort_key", "id")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).map(_._3).toSeq
    val e1 = order(docs, 1)
    assert(e1.toSet === (1L to 500L).toSet, "a permutation: every doc exactly once")
    assert(e1 === order(docs.repartition(13), 1),
      "the permutation is a pure function of the data, not the partitioning")
    val e2 = order(docs, 2)
    assert(e2.toSet === e1.toSet && e2 != e1,
      "a different epoch is a different permutation of the same corpus")
    // decorrelated, not shifted: agreement at each position is ~random
    assert(e1.zip(e2).count { case (a, b) => a == b } < 15)
    val rows = Sampling.epochShuffle(docs, "id", 1, shards = 8)
      .select("shard", "sort_key").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // shard is the 60-bit fold of the SAME key mod 8 — each shard an
    // unbiased subsample; at n=500, k=8 every shard is populated
    assert(rows.map(_._1).toSet === (0L until 8L).toSet)
    assert(rows.forall { case (sh, k) =>
      sh == java.lang.Long.parseLong(k.substring(0, 15), 16) % 8 })
  }

  test("uniformSample: exact size, deterministic, bounded by input") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("id")
    val a = Sampling.uniformSample(df, "id", 50).collect().map(_.getLong(0)).toSet
    assert(a.size === 50)
    val b = Sampling.uniformSample(df.repartition(17), "id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(Sampling.uniformSample(df.limit(5), "id", 50).count() === 5)
  }

  test("roughly uniform: the sample is not clustered at the id extremes") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 10000).map(_.toLong).toDF("id")
    val mean = Sampling.uniformSample(df, "id", 400)
      .agg(avg(col("id"))).collect()(0).getDouble(0)
    // a hash-ordered draw of 400 of 10k: mean ~ 5000 ± a few hundred
    assert(mean > 4000 && mean < 6000, s"suspicious sample mean $mean")
  }
}
