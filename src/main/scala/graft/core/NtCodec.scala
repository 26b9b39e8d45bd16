package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** N-Triples serialization as pure Catalyst Column expressions (S7/N10;
  * reference semantics: resource percent-encoding + literal escaping +
  * xsd-typing at `/root/reference/impl/util/serialize.py:11-77` and IRI
  * codecs at `/root/reference/impl/util/rdf.py:110-141`).
  *
  * Implemented as expression chains (not UDFs) so the triple writer is one
  * whole-stage-codegen'd projection feeding `write.partitionBy("pred")` —
  * at 10^11 triples the NT encoding IS the write amplification.
  */
object NtCodec {

  private val Base = "http://graft.example.org/resource/"
  private val PredBase = "http://graft.example.org/ontology/"

  /** Percent-encode the characters N-Triples forbids inside an IRI
    * (space, quotes, angle brackets, backslash, braces, pipe, caret,
    * backtick) and map spaces to underscores first (wiki-style resource
    * naming, ≙ name2iri `impl/dbpedia/util.py:6-16` semantics). */
  def encodeResourceName(c: Column): Column = {
    val underscored = regexp_replace(c, " ", "_")
    Seq("%" -> "%25", "\"" -> "%22", "<" -> "%3C", ">" -> "%3E",
        "\\|" -> "%7C", "\\^" -> "%5E", "`" -> "%60", "\\{" -> "%7B",
        "\\}" -> "%7D", "\\\\" -> "%5C")
      .foldLeft(underscored) { case (acc, (from, to)) =>
        regexp_replace(acc, from, to)
      }
  }

  /** Escape a literal per the N-Triples grammar: backslash, quote, LF, CR,
    * TAB. */
  def escapeLiteral(c: Column): Column =
    Seq("\\\\" -> "\\\\\\\\", "\"" -> "\\\\\"", "\n" -> "\\\\n",
        "\r" -> "\\\\r", "\t" -> "\\\\t")
      .foldLeft(c) { case (acc, (from, to)) =>
        // regexp_replace on the escaped pattern; replacement is literal-ish
        regexp_replace(acc, from, to)
      }

  /** xsd datatype tag by literal shape (≙ int/float/date typing,
    * `impl/util/serialize.py:22-29`). */
  def literalWithType(c: Column): Column = {
    val esc = escapeLiteral(c)
    when(c.rlike("^-?[0-9]+$"),
         concat(lit("\""), esc, lit("\"^^<http://www.w3.org/2001/XMLSchema#integer>")))
      .when(c.rlike("^-?[0-9]+\\.[0-9]+$"),
         concat(lit("\""), esc, lit("\"^^<http://www.w3.org/2001/XMLSchema#float>")))
      .when(c.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
         concat(lit("\""), esc, lit("\"^^<http://www.w3.org/2001/XMLSchema#date>")))
      .otherwise(concat(lit("\""), esc, lit("\"@en")))
  }

  def resourceIri(c: Column): Column =
    concat(lit("<" + Base), encodeResourceName(c), lit(">"))

  def predicateIri(c: Column): Column =
    concat(lit("<" + PredBase),
           encodeResourceName(regexp_replace(c, "^[a-z]+:", "")), lit(">"))

  /** One N-Triples line per (subj, pred, obj, is_literal) row. */
  def ntLine(subj: Column, pred: Column, obj: Column,
             isLiteral: Column): Column =
    concat(
      resourceIri(subj), lit(" "),
      predicateIri(pred), lit(" "),
      when(isLiteral, literalWithType(obj)).otherwise(resourceIri(obj)),
      lit(" ."))
}
