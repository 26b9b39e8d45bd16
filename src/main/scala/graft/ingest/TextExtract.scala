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
    * (same expressions ⇒ the byte-identity invariant holds by
    * construction). */
  def textFromHtmlStr(htmlStr: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noTags = regexp_replace(htmlStr, "<[^>]*>", "")
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      noTags,
      "&lt;", "<"),
      "&gt;", ">"),
      "&nbsp;", " "),
      "&amp;", "&")
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
