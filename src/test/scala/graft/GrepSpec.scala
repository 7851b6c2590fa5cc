package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Grep
import graft.functions.Text

/** Grep-over-files parity (reference client/client.py modes c/a) and
  * the key-sanitization helper. */
class GrepSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private lazy val logDir: String = {
    val dir = Files.createTempDirectory("graft-grep")
    Files.writeString(dir.resolve("vm1.log"),
      "GET /a 200\nPOST /b 500\nGET /c 200\n")
    Files.writeString(dir.resolve("vm2.log"),
      "GET /d 404\nGET /e 200\n")
    dir.toString
  }

  test("mode c: per-file counts + grand total") {
    val perFile = Grep.countPerFile(spark, s"$logDir/*.log", "200").collect()
      .map(r => r.getAs[String]("file").split("/").last -> r.getAs[Long]("cnt"))
      .toMap
    assert(perFile === Map("vm1.log" -> 2L, "vm2.log" -> 1L))
    assert(Grep.countTotal(spark, s"$logDir/*.log", "200") === 3L)
  }

  test("mode a: matching lines tagged with source file") {
    val rows = Grep.fetch(spark, s"$logDir/*.log", "^POST").collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[String]("file").endsWith("vm1.log"))
    assert(rows.head.getAs[String]("value") === "POST /b 500")
  }

  test("sanitizeKey: [/ ]->_ exactly as the reference's filename safety") {
    val spark2 = spark
    import spark2.implicits._
    val out = Seq("Loop/Video", "a b", "clean").toDF("k")
      .select(Text.sanitizeKey(org.apache.spark.sql.functions.col("k")).as("s"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("Loop_Video", "a_b", "clean"))
  }
}
