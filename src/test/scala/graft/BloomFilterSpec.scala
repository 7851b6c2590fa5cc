package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.BloomFilter

class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("prunedSemiJoin is row-identical to the plain left-semi join") {
    val spark2 = spark
    import spark2.implicits._
    // fact keys: present (1..50), absent (1000..1200), a hot key, nulls
    val fact = ((1 to 50).flatMap(k => Seq(k, k)) ++ (1000 to 1200) ++
        Seq.fill(500)(7)).map(k => (k: java.lang.Integer)) :+ (null: java.lang.Integer)
    val factDf = fact.toDF("fk").withColumn("payload", col("fk") * 10)
    val dimDf = (1 to 50).filter(_ % 3 == 0).toDF("dk")
    val plain = factDf.join(dimDf, factDf("fk") === dimDf("dk"), "left_semi")
    val pruned = BloomFilter.prunedSemiJoin(factDf, "fk", dimDf, "dk",
      numBits = 1 << 10, numHashes = 4)
    val a = plain.select("fk", "payload").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    val b = pruned.select("fk", "payload").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(a.nonEmpty && (a.toSeq === b.toSeq))
  }

  test("probe prunes a disjoint fact side before the join (few false positives)") {
    val spark2 = spark
    import spark2.implicits._
    val dimDf = (1 to 100).toDF("dk")
    val factDf = (100000 to 110000).toDF("fk")
    val bits = BloomFilter.build(dimDf, "dk", numBits = 1 << 16, numHashes = 5)
    // 500 set bits in a 65536-bit table: per-probe pass rate (500/2^16)^5
    val fp = factDf.filter(BloomFilter.mightContain(col("fk"), bits)).count()
    assert(fp <= 10, s"bloom passed $fp of 10001 disjoint keys")
    // and every present key passes (no false negatives, ever)
    val fn = dimDf.filter(!BloomFilter.mightContain(col("dk"), bits)).count()
    assert(fn === 0)
  }

  test("build is bounded by the parameter: bit count <= n*k, words sized m/64") {
    val spark2 = spark
    import spark2.implicits._
    val dimDf = (1 to 1000).toDF("dk")
    val bits = BloomFilter.build(dimDf, "dk", numBits = 1 << 16, numHashes = 3)
    assert(bits.words.length === (1 << 16) / 64)
    assert(bits.setBitCount > 0 && bits.setBitCount <= 3000L)
  }

  test("empty dim -> empty result; string keys work") {
    val spark2 = spark
    import spark2.implicits._
    val factDf = Seq("a", "b", "c").toDF("fk")
    val emptyDim = Seq.empty[String].toDF("dk")
    assert(BloomFilter.prunedSemiJoin(factDf, "fk", emptyDim, "dk",
      numBits = 64).count() === 0)
    val dimDf = Seq("b", "zzz").toDF("dk")
    val got = BloomFilter.prunedSemiJoin(factDf, "fk", dimDf, "dk",
      numBits = 1 << 8).collect().map(_.getString(0)).toSeq
    assert(got === Seq("b"))
  }

  test("plan: the bloom probe filter runs below the join exchange (map-side)") {
    val spark2 = spark
    import spark2.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join regime the probe exists for; parquet
      // sources, not LocalRelations — Catalyst constant-folds a
      // deterministic filter over a LocalTableScan away entirely
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val factDf = Tables.lineitem(spark, SparkSuite.sf0001)
      val dimDf = Tables.supplier(spark, SparkSuite.sf0001)
        .filter(col("s_nationkey") === 3).select(col("s_suppkey"))
      val df = BloomFilter.prunedSemiJoin(factDf, "l_suppkey", dimDf,
        "s_suppkey", numBits = 1 << 10)
      // string walk (collect() can't see through AdaptiveSparkPlanExec):
      // parents print before children, so the probe Filter appearing
      // AFTER the fact-side Exchange means it runs BELOW it — map-side
      val p = df.queryExecution.executedPlan.toString
      val exIdx = p.indexOf("Exchange hashpartitioning(l_suppkey")
      val probeIdx = p.indexOf("xxhash64")
      assert(probeIdx >= 0, s"no bloom probe filter in plan:\n$p")
      assert(exIdx >= 0 && probeIdx > exIdx,
        s"bloom probe sits above the fact-side exchange:\n$p")
      // and it reaches the scan stage as a data filter
      assert(p.contains("DataFilters: [((shiftright") ||
        p.replaceAll("\\s", "").contains("DataFilters:[(("),
        s"bloom probe not evaluated at the scan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
