package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextAnalysis

/** [[TextAnalysis.stripHtml]] — markup removal order, entity decode
  * order, and the RE2-compatibility constraints the oracle relies on.
  */
class StripHtmlSpec extends AnyFunSuite {
  private lazy val spark = SparkSuite.spark

  private def strip(html: String*): Seq[String] = {
    val spark2 = spark
    import spark2.implicits._
    html.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
      .select(org.apache.spark.sql.functions.col("id"),
        TextAnalysis.stripHtml("html").as("t"))
      .collect().sortBy(_.getAs[Long]("id")).map(_.getAs[String]("t")).toSeq
  }

  test("scripts and styles vanish with their content, tags become spaces") {
    assert(strip(
      "<html><head><style>p { x: 1 }</style></head><body><p>Hello" +
        "</p><script>if (1 < 2) { alert('hi'); }</script>world</body></html>")
      === Seq("Hello world"))
  }

  test("multiline script blocks and comments are removed (dotall)") {
    assert(strip(
      "a<script type=\"x\">\nline1();\nline2();\n</script>b<!-- multi\nline -->c")
      === Seq("a b c"))
  }

  test("entities decode with &amp; last, so double-encoding survives") {
    assert(strip("Tom &amp; Jerry &lt;3 &quot;hi&quot; it&#39;s&nbsp;here")
      === Seq("Tom & Jerry <3 \"hi\" it's here"))
    // &amp;lt; is the ESCAPED text "&lt;", not a tag opener
    assert(strip("show &amp;lt;b&amp;gt; literally")
      === Seq("show &lt;b&gt; literally"))
  }

  test("whitespace collapses; tagless text passes through trimmed") {
    assert(strip("  plain   text\twith\nspace  ") === Seq("plain text with space"))
    assert(strip("<div><br><p></p></div>") === Seq(""))
  }

  test("null propagates") {
    val spark2 = spark
    import spark2.implicits._
    val got = Seq((1L, null.asInstanceOf[String]))
      .toDF("id", "html")
      .select(TextAnalysis.stripHtml("html").as("t"))
      .collect()(0)
    assert(got.isNullAt(0))
  }
}
