package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.sources.Bucketed

class SkewBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("saltedJoin is row-identical to the plain join under heavy skew") {
    val spark2 = spark
    import spark2.implicits._
    // 10k rows of one hot key + a tail
    val big = ((1 to 10000).map(_ => 1) ++ (1 to 100).map(i => i % 7 + 2))
      .toDF("k").withColumn("payload", monotonically_increasing_id())
    val small = (1 to 8).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", saltFactor = 8)
    assert(salted.count() === plain.count())
    val a = plain.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = salted.groupBy("k").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("rowSalt is a pure function of row content: invariant to partitioning") {
    val spark2 = spark
    import spark2.implicits._
    // a nondeterministic salt (the old monotonically_increasing_id
    // pattern) depends on row POSITION and changes when the same data
    // is laid out differently — exactly what a stage retry does. The
    // content hash must give every row the same salt regardless of
    // partitioning.
    val df = (1 to 1000).map(i => (i % 7, i)).toDF("k", "payload")
    def saltOf(d: org.apache.spark.sql.DataFrame): Map[Int, Int] =
      d.withColumn("__s", Skew.rowSalt(d, Nil, 16))
        .select("payload", "__s").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(saltOf(df) === saltOf(df.repartition(13)))
    // narrow basis: same invariance
    def saltNarrow(d: org.apache.spark.sql.DataFrame): Map[Int, Int] =
      d.withColumn("__s", Skew.rowSalt(d, Seq(col("payload")), 16))
        .select("payload", "__s").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(saltNarrow(df) === saltNarrow(df.repartition(5).sortWithinPartitions("payload")))
  }

  test("saltedGroupCount equals plain groupBy count") {
    val spark2 = spark
    import spark2.implicits._
    val df = ((1 to 5000).map(_ => "hot") ++ Seq("a", "a", "b")).toDF("k")
    val got = Skew.saltedGroupCount(df, "k", 16).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("hot" -> 5000L, "a" -> 2L, "b" -> 1L))
  }

  test("saltedTopK equals the single-window top-k, rows and ranks") {
    val li = Tables.lineitem(spark, SparkSuite.sf0001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"))
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
                    col("l_linenumber").asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_returnflag")).orderBy(order: _*)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("l_returnflag"), r.getAs[Long]("l_orderkey"),
       r.getAs[Int]("l_linenumber"), r.getAs[Int]("rn"))
    val plain = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).collect().map(key).toSet
    // the forced two-phase arm (k=5 through the public entry would
    // dispatch to the plain window — see the threshold test below),
    // across salt factors including 1 (degenerate = plain window) and
    // a factor far above the per-group row count
    for (f <- Seq(1, 4, 64, 4096)) {
      val salted = Skew.saltedTopKForced(li, Seq("l_returnflag"), order,
        k = 5, saltFactor = f).collect().map(key).toSet
      assert(salted === plain, s"saltFactor=$f diverged")
    }
    // narrow salt basis (group + order expressions) — same rows/ranks
    val narrow = Skew.saltedTopKForced(li, Seq("l_returnflag"), order, k = 5,
      saltFactor = 64,
      saltCols = Seq(col("l_returnflag"), col("l_extendedprice"),
                     col("l_orderkey"), col("l_linenumber")))
      .collect().map(key).toSet
    assert(narrow === plain, "narrow saltCols diverged")
  }

  test("saltedTopK dispatches on the WindowGroupLimit threshold") {
    val li = Tables.lineitem(spark, SparkSuite.sf0001)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
              col("l_extendedprice"))
    val order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
                    col("l_linenumber").asc)
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    // k ≤ threshold (default 1000): plain single window — the
    // optimizer's partial group-limit bounds the shuffle for free
    // (TopKBench: plain ~0.55 s vs salted ~0.95 s on the hot-group
    // input), so no salt column may appear in the plan AND the
    // WindowGroupLimit node the whole premise rests on must actually
    // be there (if a future change breaks the Filter-over-Window
    // pattern the rule needs, the plain arm silently loses its bound)
    val small = Skew.saltedTopK(li, Seq("l_returnflag"), order, k = 5)
    assert(!planOf(small).contains("__salt"),
      "k below the threshold must use the plain window")
    assert(planOf(small).contains("WindowGroupLimit"),
      "the plain arm's shuffle bound (WindowGroupLimit) did not fire")
    // k > threshold: the rule is off, the plain window would funnel
    // the whole hot group through one task (TopKBench: 13.9 s vs
    // 1.7 s salted at k=2000) — the salted two-phase must engage
    val big = Skew.saltedTopK(li, Seq("l_returnflag"), order, k = 1001)
    assert(planOf(big).contains("__salt"),
      "k above the threshold must use the salted two-phase")
  }

  test("sourceCap and the salt default accept schemas with map columns") {
    val spark2 = spark
    import spark2.implicits._
    // xxhash64 rejects MapType; the narrow (source, order) salt basis
    // must make sourceCap schema-agnostic again
    val df = (1 to 100).map(i => (s"src${i % 3}", i.toLong, Map("a" -> i)))
      .toDF("source", "doc_id", "attrs")
    val capped = graft.operators.TextAnalysis.sourceCap(df, "source", "doc_id", 5)
    assert(capped.count() === 15)
    assert(capped.columns.toSeq === Seq("source", "doc_id", "attrs"))
    // cap=5 dispatches to the plain window, which never evaluates the
    // salt — exercise the SALTED arm against the same schema, both
    // with sourceCap's narrow basis and with the full-row default
    // (which must skip the unhashable map column, not throw)
    val salted = Skew.saltedTopKForced(df, Seq("source"),
      Seq(col("doc_id")), k = 5, saltFactor = 8,
      saltCols = Seq(col("source"), col("doc_id")))
    assert(salted.drop("rn").count() === 15)
    val fullRowDefault = Skew.saltedTopKForced(df, Seq("source"),
      Seq(col("doc_id")), k = 5, saltFactor = 8)
    assert(fullRowDefault.drop("rn").count() === 15)
    // degenerate-but-correct: once the map column is skipped the
    // default basis is just the key, so every row of a key shares one
    // bucket (no spread — documented in rowSalt) but counts stay exact
    val mapOnly = (1 to 20).map(i => (s"s${i % 2}", Map("a" -> i)))
      .toDF("source", "attrs")
    val g = Skew.saltedGroupCount(mapOnly, "source", 4).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g === Map("s0" -> 10L, "s1" -> 10L))
  }

  test("bucketed tables join on the bucket key with no shuffle exchange") {
    val li = Tables.lineitem(spark, SparkSuite.sf0001)
      .select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, SparkSuite.sf0001)
      .select("o_orderkey", "o_totalprice")
    Bucketed.write(li, "graft_li_bkt", "l_orderkey", buckets = 8)
    Bucketed.write(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "graft_o_bkt", "l_orderkey", buckets = 8)
    val joined = Bucketed.read(spark, "graft_li_bkt")
      .join(Bucketed.read(spark, "graft_o_bkt"), "l_orderkey")
    assert(joined.count() > 0)
    assert(!Bucketed.hasShuffle(joined),
      "bucketed equi-join must read co-located buckets without an exchange")
    // (no contrast assertion against the plain join: at sf0.001 AQE
    // legitimately broadcasts it, which also has no hash exchange)
  }
}
