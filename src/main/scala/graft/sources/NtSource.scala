package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-Triples text source (S2; reference: the regex line parser
  * `/root/reference/impl/util/rdf.py:144-161` with its separate
  * object-triple and literal-triple patterns) — `spark.read.text` +
  * `regexp_extract` into (subj, pred, obj, is_literal), the inverse of
  * [[graft.core.NtCodec]]. Round-trip (emit → parse) is asserted in
  * NtRoundTripSpec.
  *
  * Pure projection over a text scan: predicate/line filters push into the
  * scan; no shuffle.
  */
object NtSource {

  private val Base = "http://graft.example.org/resource/"
  private val PredBase = "http://graft.example.org/ontology/"

  private val objPat =
    "^<([^>]+)> <([^>]+)> <([^>]+)> \\.$"
  private val litPat =
    "^<([^>]+)> <([^>]+)> \"(.*)\"(?:\\^\\^<[^>]+>|@[a-zA-Z-]+)? \\.$"

  /** Decode an IRI back to a resource name (strip base, _→space,
    * %XX-decode) — ≙ iri2name, `/root/reference/impl/util/rdf.py:110-120`. */
  def decodeName(iri: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val stripped = regexp_replace(iri, s"^${java.util.regex.Pattern.quote(Base)}", "")
    val unesc = Seq("%25" -> "%", "%22" -> "\"", "%3C" -> "<", "%3E" -> ">",
                    "%7C" -> "|", "%5E" -> "\\^", "%60" -> "`",
                    "%7B" -> "\\{", "%7D" -> "\\}", "%5C" -> "\\\\")
      .foldRight(regexp_replace(stripped, "_", " ")) { case ((from, to), acc) =>
        regexp_replace(acc, from, to)
      }
    unesc
  }

  private def unescapeLiteral(c: org.apache.spark.sql.Column) =
    Seq("\\\\t" -> "\t", "\\\\r" -> "\r", "\\\\n" -> "\n",
        "\\\\\"" -> "\"", "\\\\\\\\" -> "\\\\")
      .foldLeft(c) { case (acc, (from, to)) => regexp_replace(acc, from, to) }

  /** Parse NT lines (one column `value`) into the triple schema. */
  def parse(lines: DataFrame): DataFrame = {
    val objTriples = lines
      .filter(col("value").rlike(objPat))
      .select(
        decodeName(regexp_extract(col("value"), objPat, 1)).as("subj"),
        regexp_replace(regexp_extract(col("value"), objPat, 2),
          s"^${java.util.regex.Pattern.quote(PredBase)}", "").as("pred"),
        decodeName(regexp_extract(col("value"), objPat, 3)).as("obj"),
        lit(false).as("is_literal"))
    val litTriples = lines
      .filter(!col("value").rlike(objPat) && col("value").rlike(litPat))
      .select(
        decodeName(regexp_extract(col("value"), litPat, 1)).as("subj"),
        regexp_replace(regexp_extract(col("value"), litPat, 2),
          s"^${java.util.regex.Pattern.quote(PredBase)}", "").as("pred"),
        unescapeLiteral(regexp_extract(col("value"), litPat, 3)).as("obj"),
        lit(true).as("is_literal"))
    objTriples.unionByName(litTriples)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    parse(spark.read.text(path))
}
