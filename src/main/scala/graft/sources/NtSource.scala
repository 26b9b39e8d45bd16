package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.NtCodec

/** N-Triples text source (S2; reference: the regex line parser
  * `/root/reference/impl/util/rdf.py:144-161` with its separate
  * object-triple and literal-triple patterns) — the inverse of
  * [[graft.core.NtCodec]]. Round-trip (emit → parse) is asserted in
  * SourcesChunkSpec.
  *
  * Two read paths:
  *  - [[parse]]/[[read]]: text scan + regexp_extract + the single-pass
  *    native decode expressions (no shuffle);
  *  - [[NtDataSource]] (`spark.read.format("graft-nt")`): a DataSourceV2
  *    with one input partition per file and column pruning pushed into the
  *    reader.
  */
object NtSource {

  /** The graft emit namespace ([[graft.core.NtCodec]]'s encoder base) —
    * the default base [[decodeName]] strips. Foreign dumps (e.g. a DBpedia
    * NIF corpus) pass their own base instead. */
  val DefaultResourceBase = "http://graft.example.org/resource/"
  private val Base = DefaultResourceBase
  private val PredBase = "http://graft.example.org/ontology/"

  private[sources] val objPat =
    "^<([^>]+)> <([^>]+)> <([^>]+)> \\.$"
  private[sources] val litPat =
    "^<([^>]+)> <([^>]+)> \"(.*)\"(?:\\^\\^<[^>]+>|@[a-zA-Z-]+)? \\.$"

  private val objRe = objPat.r
  private val litRe = litPat.r

  /** Line-level parser shared by the DSv2 reader and tests: one NT line →
    * (subj, pred, obj, is_literal); None for non-triple lines. */
  def parseLine(line: String): Option[(String, String, String, Boolean)] =
    line match {
      case objRe(s, p, o) =>
        Some((NtCodec.decodeResourceJava(stripBase(s, Base)),
              stripBase(p, PredBase),
              NtCodec.decodeResourceJava(stripBase(o, Base)), false))
      case litRe(s, p, o) =>
        Some((NtCodec.decodeResourceJava(stripBase(s, Base)),
              stripBase(p, PredBase),
              NtCodec.unescapeLiteralJava(o), true))
      case _ => None
    }

  private def stripBase(iri: String, base: String): String =
    if (iri.startsWith(base)) iri.substring(base.length) else iri

  /** Decode an IRI back to a resource name — full single-pass inverse of
    * the encoder (strip base, _→space, %XX UTF-8 decode) ≙ iri2name +
    * unquote, `/root/reference/impl/util/rdf.py:110-120,139-140`. Requires
    * [[graft.core.Normalize.register]]. */
  def decodeName(iri: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    decodeName(iri, Base)

  /** [[decodeName]] with an explicit namespace to strip — foreign dumps
    * (ADVICE r4: stripping only the graft base left DBpedia resource keys
    * as mangled full IRIs). */
  def decodeName(iri: org.apache.spark.sql.Column,
                 base: String): org.apache.spark.sql.Column =
    call_function("nt_decode_resource",
      regexp_replace(iri, s"^${java.util.regex.Pattern.quote(base)}", ""))

  private def unescapeLiteral(c: org.apache.spark.sql.Column) =
    call_function("nt_unescape_literal", c)

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
