package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** N-Triples serialization (S7/N10) as NATIVE single-pass Catalyst
  * expressions with `doGenCode` — the triple writer is one whole-stage-
  * codegen'd projection feeding `write.partitionBy("pred")`; at 10^11
  * triples the NT encoding IS the write amplification, so each string is
  * rewritten exactly once (the previous regexp_replace fold rewrote every
  * value ~15 times).
  *
  * Reference semantics, pinned by the reference's own unit goldens
  * (`/root/reference/tests/unit/util/test_serialize.py:6-15`):
  *  - resource names: wiki-style space→underscore (`rdf.py:135`), then
  *    percent-encode every byte outside urllib's unreserved set EXCEPT the
  *    readability exceptions # : , ; ( ) ' & ! * = $
  *    (`serialize.py:16,63-71` — e.g. `"` → %22, `/` → %2F, `_` kept);
  *  - literals: escape \ and ", then whitespace-squash
  *    (`serialize.py:17,74-77` + `string.py:8-9` regularize_spaces — so
  *    control whitespace never reaches the literal);
  *  - xsd typing by literal shape (`serialize.py:11-14,22-29`).
  */
object NtCodec {

  private val Base = "http://graft.example.org/resource/"
  private val PredBase = "http://graft.example.org/ontology/"

  /** quote()'s unreserved set + the reference's encoding exceptions. */
  private def keepAsIs(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
    (c >= '0' && c <= '9') || "_.~-" .indexOf(c) >= 0 ||
    "#:,;()'&!*=$".indexOf(c) >= 0

  /** Single pass: space→'_', keep unreserved+exceptions, %XX-encode the
    * UTF-8 bytes of everything else (uppercase hex, like urllib.quote).
    * Iterates by CODE POINT — a lone-surrogate iteration would corrupt
    * non-BMP characters (emoji, CJK extensions) to '?'. */
  def encodeResourceJava(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      if (cp == ' ') sb.append('_')
      else if (cp < 128 && keepAsIs(cp.toChar)) sb.append(cp.toChar)
      else {
        val bytes = new String(Character.toChars(cp)).getBytes("UTF-8")
        var j = 0
        while (j < bytes.length) {
          sb.append('%')
          sb.append(String.format("%02X", Byte.box(bytes(j))))
          j += 1
        }
      }
      i += n
    }
    sb.toString
  }

  /** python str.split() whitespace: Java's isWhitespace misses the
    * non-breaking Zs spaces (U+00A0, U+2007, U+202F) and NEL (U+0085)
    * that Python treats as whitespace. */
  private def isPyWhitespace(c: Char): Boolean =
    Character.isWhitespace(c) || Character.isSpaceChar(c) || c == '\u0085'

  /** Single pass: escape \ and ", squash whitespace runs to one space,
    * trim (≡ escape + ' '.join(text.split())). */
  def escapeLiteralJava(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isPyWhitespace(c)) pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        if (c == '\\') sb.append("\\\\")
        else if (c == '"') sb.append("\\\"")
        else sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Inverse of [[encodeResourceJava]] (≙ iri2name + urllib.unquote,
    * `rdf.py:110-120,139-140`): '_'→space, full %XX UTF-8 percent-decode.
    * Lossy like the reference: original underscores become spaces. */
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  def decodeResourceJava(s: String): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // strict [0-9A-Fa-f]{2} like urllib.unquote — Integer.parseInt would
      // also accept signed forms like '%-5' and emit bogus bytes
      if (cp == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else if (cp == '_') { out.write(' '); i += 1 }
      else {
        // code-point iteration: lone surrogates would corrupt non-BMP
        val n = Character.charCount(cp)
        val bytes = new String(Character.toChars(cp)).getBytes("UTF-8")
        out.write(bytes, 0, bytes.length)
        i += n
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  /** Inverse of [[escapeLiteralJava]]'s escaping (single pass). */
  def unescapeLiteralJava(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '"'  => sb.append('"'); i += 2
          case 'n'  => sb.append('\n'); i += 2
          case 'r'  => sb.append('\r'); i += 2
          case 't'  => sb.append('\t'); i += 2
          case _    => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  abstract class NtStringExpr extends UnaryExpression {
    override def dataType: DataType = StringType
    /** fully-qualified static method called from generated code */
    def javaFn: String
    def eval(s: String): String
    override def nullSafeEval(input: Any): Any =
      UTF8String.fromString(eval(input.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = UTF8String.fromString($javaFn($c.toString()));")
  }

  case class NtEncodeResourceExpr(child: Expression) extends NtStringExpr {
    def javaFn: String = "graft.core.NtCodec.encodeResourceJava"
    def eval(s: String): String = encodeResourceJava(s)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  case class NtEscapeLiteralExpr(child: Expression) extends NtStringExpr {
    def javaFn: String = "graft.core.NtCodec.escapeLiteralJava"
    def eval(s: String): String = escapeLiteralJava(s)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  case class NtDecodeResourceExpr(child: Expression) extends NtStringExpr {
    def javaFn: String = "graft.core.NtCodec.decodeResourceJava"
    def eval(s: String): String = decodeResourceJava(s)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  case class NtUnescapeLiteralExpr(child: Expression) extends NtStringExpr {
    def javaFn: String = "graft.core.NtCodec.unescapeLiteralJava"
    def eval(s: String): String = unescapeLiteralJava(s)
    override protected def withNewChildInternal(newChild: Expression) =
      copy(child = newChild)
  }

  /** Percent-encode a resource NAME (≙ _encode_resource + label2name).
    * Resolves through the session function registry (the public way to
    * splice a custom Expression into plans) — [[Normalize.register]] must
    * have run on the session; pipeline entry points and specs do. */
  def encodeResourceName(c: Column): Column =
    call_function("nt_encode_resource", c)

  /** Escape a literal per the reference (backslash, quote, space-squash). */
  def escapeLiteral(c: Column): Column =
    call_function("nt_escape_literal", c)

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

  /** Absolute IRIs (provenance page URLs) pass through verbatim — the
    * reference serializes res2wiki_iri output unencoded
    * (`serialize.py:158-164,231-239`); everything else is a resource NAME
    * percent-encoded into the base namespace. */
  def resourceIri(c: Column): Column =
    when(c.rlike("^https?://"), concat(lit("<"), c, lit(">")))
      .otherwise(concat(lit("<" + Base), encodeResourceName(c), lit(">")))

  def predicateIri(c: Column): Column =
    concat(lit("<" + PredBase),
           encodeResourceName(regexp_replace(c, "^[a-z]+:", "")), lit(">"))

  /** One N-Triples line per (subj, pred, obj, is_literal) row.
    *
    * Property-valued POSITIONS render through [[predicateIri]] so ontology
    * declarations attach to the SAME IRI the data triples use as predicate
    * (else `clg:locatedIn` declares as `<Base/clg%3AlocatedIn>` while data
    * uses `<PredBase/locatedIn>` and a triplestore sees two disjoint
    * terms). The OWL vocabulary itself identifies those positions: the
    * subject of an owl:ObjectProperty typing or an owl:equivalentProperty
    * mapping, and the object of owl:onProperty. equivalentProperty's
    * OBJECT stays a resource — it names an EXTERNAL property (opaque input
    * string in this engine) that never occurs as a predicate here, and
    * rendering it into our predicate namespace could collide with a local
    * predicate of the same local name. */
  def ntLine(subj: Column, pred: Column, obj: Column,
             isLiteral: Column): Column = {
    val subjIsProperty =
      (pred === "rdf:type" && obj === "owl:ObjectProperty") ||
        pred === "owl:equivalentProperty"
    val objIsProperty = pred === "owl:onProperty"
    concat(
      when(subjIsProperty, predicateIri(subj)).otherwise(resourceIri(subj)),
      lit(" "),
      predicateIri(pred), lit(" "),
      when(isLiteral, literalWithType(obj))
        .when(objIsProperty, predicateIri(obj))
        .otherwise(resourceIri(obj)),
      lit(" ."))
  }
}
