package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sql.SelectParser

class SelectParserSpec extends AnyFunSuite {

  test("parses the three documented regex forms") {
    assert(SelectParser.parse("SELECT ALL FROM traffic.csv WHERE Video.*Radio")
      === SelectParser.SelectAll("traffic.csv", "Video.*Radio"))
    assert(SelectParser.parse("SELECT ALL FROM traffic.csv WHERE Video,Radio")
      === SelectParser.SelectAll("traffic.csv", "Video,Radio"))
    assert(SelectParser.parse("SELECT ALL FROM traffic.csv WHERE 'Video|Radio'")
      === SelectParser.SelectAll("traffic.csv", "Video|Radio"))
  }

  test("rejects non-6-token commands (reference grammar is exactly 6 tokens)") {
    intercept[IllegalArgumentException](SelectParser.parse("SELECT ALL FROM x"))
    intercept[IllegalArgumentException](
      SelectParser.parse("SELECT ALL FROM x WHERE a b"))
    intercept[IllegalArgumentException](
      SelectParser.parse("SELECT * FROM x WHERE a"))
  }

  test("filter semantics: unanchored whole-line match, rows verbatim") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq(("1", "Video"), ("2", "Radio"), ("3", "Loop"))
      .toDF("id", "det")
    val out = SelectParser.select(df, "SELECT ALL FROM t WHERE 'Video|Radio'")
      .collect().map(_.getAs[String]("id")).toSet
    assert(out === Set("1", "2"))
    // comma form matches across the column seam of the raw line
    val seam = SelectParser.select(df, "SELECT ALL FROM t WHERE 2,Radio")
      .collect().map(_.getAs[String]("id")).toSet
    assert(seam === Set("2"))
  }

  test("NULL cells serialize as empty fields, preserving comma adjacency") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val df = Seq(("1", null: String, "Radio"), ("2", "x", "Radio"))
      .toDF("id", "mid", "det")
    // row 1's raw line must be "1,,Radio" — a dropped NULL would
    // collapse it to "1,Radio" and false-match the comma form below
    assert(SelectParser.select(df, "SELECT ALL FROM t WHERE 1,Radio")
      .count() === 0L)
    assert(SelectParser.select(df, "SELECT ALL FROM t WHERE 1,,Radio")
      .count() === 1L)
  }
}
