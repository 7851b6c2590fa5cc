package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** A broken query must leave a durable trace: round 12's three event-query
  * regressions surfaced only as stderr lines and ABSENT correctness
  * entries. Pins that [[Verify.runQueries]] records the failure, still
  * runs the remaining queries, and that failures.json carries it. */
class VerifySpec extends AnyFunSuite {
  private val spark = SparkSuite.spark

  test("a deliberately-broken query lands in failures.json; healthy ones still run") {
    val out = Files.createTempDirectory("graft_verify_").toString
    val queries = Map[String, (SparkSession, String) => DataFrame](
      "q_ok" -> ((s, _) => s.range(3).toDF("n")),
      "q_boom" -> ((s, d) => s.read.parquet(s"$d/no_such_table.parquet")),
    )
    val failures = Verify.runQueries(spark, SparkSuite.sf0001, out, queries)
    assert(failures.map(_._1) == Seq("q_boom"))
    assert(Files.exists(Paths.get(s"$out/q_ok")), "healthy query output written")

    val n = Verify.writeArtifacts(out, Map("q_ok" -> "SELECT 1 AS n"), failures)
    assert(n == 1)
    val json = Files.readString(Paths.get(s"$out/failures.json"))
    assert(json.contains("\"q_boom\""))
    // the artifact must be machine-readable JSON with the error payload
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("no failures writes an empty failures object") {
    val out = Files.createTempDirectory("graft_verify_").toString
    val n = Verify.writeArtifacts(out, Map.empty, Nil)
    assert(n == 0)
    assert(Files.readString(Paths.get(s"$out/failures.json")) == "{}")
  }
}
