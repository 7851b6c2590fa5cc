package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Sessionize}
import graft.streaming.EventStream

class SessionizeAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  test("sessionizeSorted: gap splits, counts and spans") {
    val out = Sessionize.sessionizeSorted(7L, Seq(0L, 10L, 20L, 5000L, 5005L), gapMs = 100L)
    assert(out.map(s => (s.session_id, s.cnt, s.start_ms, s.end_ms)) ===
      Seq((1L, 3L, 0L, 20L), (2L, 2L, 5000L, 5005L)))
  }

  test("batch sessions match hand-built fixture") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, 0L), (1L, 60L), (1L, 100000L),        // user 1: 2 sessions (gap 100ms)
      (2L, 50L),                                  // user 2: 1 session
    ).toDF("user_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val got = Sessionize.sessions(df, "user_id", "ts", gapMs = 1000L)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
                 r.getAs[Long]("cnt"))).toSet
    assert(got === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("streaming sessions close on event-time timeout and equal batch on finite input") {
    val dir = Files.createTempDirectory("graft-sess").toString
    val ev = Tables.events(spark, SparkSuite.sf0001)
      .select(col("user_id"), col("ts"))
    // Sessions are emitted only when they CLOSE. On a finite input the
    // last session per user closes via EventTimeTimeout, which needs
    // the watermark to advance past its end + gap — so append one
    // far-future sentinel event (user -1) that drags the watermark
    // forward. Every real session then times out and is emitted; the
    // sentinel's own still-open session is the only one withheld.
    val flush = ev.agg(max(col("ts")).as("ts"))
      .select(lit(-1L).as("user_id"),
              (col("ts") + expr("INTERVAL 30 DAYS")).as("ts"))
    ev.union(flush).write.mode("overwrite").parquet(dir)
    val batch = Sessionize.sessions(
        spark.read.parquet(dir).filter(col("user_id") =!= -1L), "user_id", "ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val q = EventStream.sessionizeStream(spark, dir, delay = "0 seconds")
      .writeStream
      .outputMode("append").format("memory").queryName("graft_sessions").start()
    try q.processAllAvailable() finally q.stop()
    val stream = spark.table("graft_sessions").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("asOf attaches the latest right row at-or-before each left row") {
    val spark2 = spark
    import spark2.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, 1.0), (1L, 20L, 2.0), (1L, 30L, 3.0), (3L, 1L, 9.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", "rt", Seq("v"))
      .collect()
      .map(r => (r.getAs[String]("tag"),
                 Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
                 Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))
      .toSet
    assert(out === Set(
      ("a", Some(5L), Some(1.0)),   // latest right ≤ 10 is t=5
      ("b", Some(20L), Some(2.0)),  // equal timestamps match (≤)
      ("c", None, None),            // key 2 has no right rows at all
    ))
  }
}
