package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.sources.XmlDumpSource

/** Driver-contract query for the XML page-dump source (S1): documents →
  * deterministic `<page>` chunks (exactly what the `lineSep=</page>` scan
  * yields per row, entity-escaped like a real dump) → [[XmlDumpSource]]
  * parse → rows DuckDB derives straight from `documents`. Same
  * generate→operate→check shape as the NIF and multimodal rows.
  */
object XmlQueries {

  private def xmlEscape(c: Column): Column =
    replace(
      replace(
        replace(c, lit("&"), lit("&amp;")),
        lit("<"), lit("&lt;")),
      lit(">"), lit("&gt;"))

  /** One `<page>` chunk per document. Titles carry an escaped `&`; markup
    * carries escaped wiki tags; every 4th document sits in a dropped
    * namespace (ns=7) to exercise the filter. */
  def pageChunks(docs: DataFrame): DataFrame = {
    val ns = when(pmod(col("doc_id"), lit(4)) === 0, "0")
      .when(pmod(col("doc_id"), lit(4)) === 1, "10")
      .when(pmod(col("doc_id"), lit(4)) === 2, "14")
      .otherwise("7")
    val markupRaw = concat(col("text"), lit(" see <ref name=\"r&d\">x</ref>"))
    docs.select(concat(
      lit("<page>\n    <title>d"), col("doc_id"), lit(" &amp; co</title>\n    <ns>"),
      ns, lit("</ns>\n    <revision><text xml:space=\"preserve\">"),
      xmlEscape(markupRaw), lit("</text></revision>\n  ")).as("value"))
  }

  /** S1 roundtrip: generate the chunk per document, parse it back through
    * the real XmlDumpSource path (regex extract + entity unescape + ns
    * filter). */
  def pagesRoundtrip(s: SparkSession, d: String): DataFrame =
    XmlDumpSource.pages(pageChunks(Tables.documents(s, d)))

  val pagesRoundtripSql: String =
    """SELECT 'd' || doc_id || ' & co' AS title,
              CASE WHEN doc_id % 4 = 0 THEN '0'
                   WHEN doc_id % 4 = 1 THEN '10'
                   ELSE '14' END AS ns,
              trim(text || ' see <ref name="r&d">x</ref>') AS markup
       FROM documents WHERE doc_id % 4 <> 3"""
}
