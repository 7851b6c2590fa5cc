package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{QueryPack, Tables}
import graft.operators.Grep
import graft.sql.SelectParser

/** The reference's SQL + grep surfaces as driver-checkable queries
  * (SURVEY.md §2.2 ops 15-17, §2.4 op 23), exercised over the
  * `documents` table so DuckDB's `regexp_matches` can oracle them.
  *
  * The three regex forms are the ones the reference documents
  * (README.md:53-56): wildcard `a.*b`, literal comma `a,b` (adjacent
  * columns in the raw line), and alternation `'a|b'`.
  */
object SelectPack extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)

  /** DuckDB equivalent of [[SelectParser.rowAsLine]] on documents. */
  private val docLine =
    "concat_ws(',', doc_id, text, lang, source, n_chars)"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_select_wildcard" -> ((s, d) =>
      SelectParser.select(docs(s, d),
        "SELECT ALL FROM documents WHERE spark.*window")),

    "q_select_comma" -> ((s, d) =>
      // literal comma = adjacency across the lang,source column seam
      SelectParser.select(docs(s, d),
        "SELECT ALL FROM documents WHERE en,src3")),

    "q_select_alternation" -> ((s, d) =>
      SelectParser.select(docs(s, d),
        "SELECT ALL FROM documents WHERE 'vector|stream'")),

    "q_grep_count" -> ((s, d) =>
      Grep.countPerKey(docs(s, d), "text", "source", "spark")),

    "q_grep_fetch" -> ((s, d) =>
      docs(s, d).filter(org.apache.spark.sql.functions.col("text")
        .rlike("hash.*merge"))
        .select("doc_id", "text")),
  )

  override def oracleSql: Map[String, String] = Map(
    "q_select_wildcard" ->
      s"SELECT * FROM documents WHERE regexp_matches($docLine, 'spark.*window')",

    "q_select_comma" ->
      s"SELECT * FROM documents WHERE regexp_matches($docLine, 'en,src3')",

    "q_select_alternation" ->
      s"SELECT * FROM documents WHERE regexp_matches($docLine, 'vector|stream')",

    "q_grep_count" ->
      """SELECT source, count(*) AS cnt FROM documents
        |WHERE regexp_matches(text, 'spark') GROUP BY 1""".stripMargin,

    "q_grep_fetch" ->
      "SELECT doc_id, text FROM documents WHERE regexp_matches(text, 'hash.*merge')",
  )
}
