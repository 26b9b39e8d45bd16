package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic html→text extraction — the north rule's INVARIANT stage:
  * byte-identical output per url across runs and parallelism levels.
  *
  * Reference analogue: markup normalization
  * `/root/reference/impl/wikipedia/page_parser.py:224-251` (strip
  * `<ref>`/`<br>`/entities before parsing). Here: a pure Column-expression
  * chain — strip tags, then decode entities (&lt;/&gt;/&nbsp; first, &amp;
  * last, the standard order) — no UDF, no RNG, no partition-order
  * dependence. Purity is what makes the invariant hold: the same input byte
  * string maps to the same output byte string on any executor.
  *
  * The language filter runs FIRST (cheap predicate before the regex chain —
  * the predicate-before-UDF pattern, ≙ F1 `page_parser.py:226-227`); it is
  * pushed into the parquet scan by Catalyst.
  */
object TextExtract {

  /** The pure html→text chain on a STRING column — the single definition
    * both [[extract]] and adapters deriving the golden `text` column use
    * (same expression ⇒ the byte-identity invariant holds by
    * construction). Native single-expression path: TWO char scans instead
    * of five regex passes — extraction is the #1 bytes-touched stage of
    * the per-page pipeline, and the job is memory-bandwidth-bound before
    * it is CPU-bound (BENCH/BASELINE.md decomposition), so fewer full-
    * string materializations is the lever that matters. Byte-equivalence
    * to the regex chain is property-tested ([[textFromHtmlRegex]] is the
    * reference twin) AND cross-engine-gated (the kg_extract_invariant
    * oracle recomputes the regex chain in DuckDB). Requires
    * [[graft.core.Normalize.register]] on the session (all entry points
    * and specs register). */
  def textFromHtmlStr(htmlStr: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    call_function("html_to_text", htmlStr)

  /** The original 5-pass regex chain — kept verbatim as the REFERENCE twin
    * the equivalence property-spec compares [[htmlToTextJava]] against,
    * and the shape the DuckDB oracle mirrors. Not used on the hot path. */
  def textFromHtmlRegex(htmlStr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noTags = regexp_replace(htmlStr, "<[^>]*>", "")
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags,
      "&lt;", "<"),
      "&gt;", ">"),
      "&nbsp;", " "),
      "&amp;", "&")
  }

  /** Called from generated code — must be public + stable. Exactly ≡ the
    * 5-pass regex chain, in two char scans:
    *  - tag strip (≙ `regexp_replace("<[^>]*>", "")`): a '<' with a later
    *    '>' consumes through the first such '>'; a '<' with none stays.
    *    Junctions can never form NEW tags (any '<' preceding a matched tag
    *    would itself have matched first), so one scan suffices.
    *  - entity decode (≙ the four sequential passes, in order
    *    &lt; &gt; &nbsp; &amp;): the four patterns are mutually exclusive
    *    per position and non-overlapping, and only the LAST pass creates
    *    new '&' (never re-examined) — so one left-to-right scan replaces
    *    exactly the same occurrence set. Entity decode MUST run on the
    *    tag-stripped string: tag junctions DO form new entities
    *    ("&l<x>t;" → "&lt;" → '<'), which is why the scans cannot fuse. */
  def htmlToTextJava(s: String): String = {
    val n = s.length
    val t = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i + 1)
        if (close < 0) { t.append(c); i += 1 } else i = close + 1
      } else { t.append(c); i += 1 }
    }
    val m = t.length()
    def at(idx: Int, pat: String): Boolean = {
      if (idx + pat.length > m) return false
      var j = 1 // caller matched '&' at idx
      while (j < pat.length) {
        if (t.charAt(idx + j) != pat.charAt(j)) return false
        j += 1
      }
      true
    }
    val out = new java.lang.StringBuilder(m)
    i = 0
    while (i < m) {
      val c = t.charAt(i)
      if (c == '&') {
        if (at(i, "&lt;")) { out.append('<'); i += 4 }
        else if (at(i, "&gt;")) { out.append('>'); i += 4 }
        else if (at(i, "&nbsp;")) { out.append(' '); i += 6 }
        else if (at(i, "&amp;")) { out.append('&'); i += 5 }
        else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Native expression for [[htmlToTextJava]] (codegen'd static call, the
    * [[graft.core.NtCodec.NtStringExpr]] discipline). */
  case class HtmlToTextExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends graft.core.NtCodec.NtStringExpr {
    def javaFn: String = "graft.ingest.TextExtract.htmlToTextJava"
    def eval(s: String): String = htmlToTextJava(s)
    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
      copy(child = newChild)
  }

  /** Binary-column form of [[textFromHtmlStr]] (the page table's `html`). */
  def textFromHtml(html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    textFromHtmlStr(decode(html, "UTF-8"))

  /** pages(url, warc_ts, html, text, lang) → (url, text) for lang='en',
    * where text is re-derived from html (NOT taken from the input column —
    * the input column is the golden expected value the invariant test
    * compares against). */
  def extract(pages: DataFrame): DataFrame =
    pages.filter(col("lang") === "en")
      .select(col("url"), textFromHtml(col("html")).as("text"))
}
