package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Text-analysis operators for a training-data pipeline: language-ID
  * (n-gram/stopword heuristic), quality scoring, token counting (whitespace
  * + BPE-ish regex), and document fingerprinting (rolling hash).
  *
  * All pure Column expressions (array higher-order functions) — zero UDFs,
  * zero shuffles: every operator here is embarrassingly row-parallel, the
  * shape that scales linearly to 100 TB with no coordination.
  */
object TextOps {

  private def toks: Column = split(col("text"), " ")

  /** Language ID via stopword-profile scoring (the deterministic n-gram
    * heuristic family; reference analogue: language-tag handling in
    * `impl/wikipedia/wikimarkup_parser.py:29-38`). Profiles score marker
    * tokens; argmax wins, 'und' if no evidence. */
  def langId(s: SparkSession, d: String): DataFrame = {
    def cnt(t: String): Column =
      size(filter(toks, x => x === lit(t))).cast("double")
    val enScore = (cnt("the") + cnt("a") + cnt("of")) / size(toks)
    Tables.documents(s, d).select(
      col("doc_id"),
      when(enScore >= 0.01, lit("en")).otherwise(lit("und")).as("pred_lang"),
      round(enScore, 6).as("en_score"))
  }

  val langIdSql: String =
    """SELECT doc_id,
       CASE WHEN (len(list_filter(string_split(text,' '), x -> x='the'))
                + len(list_filter(string_split(text,' '), x -> x='a'))
                + len(list_filter(string_split(text,' '), x -> x='of')))
                / CAST(len(string_split(text,' ')) AS DOUBLE) >= 0.01
            THEN 'en' ELSE 'und' END AS pred_lang,
       round((len(list_filter(string_split(text,' '), x -> x='the'))
            + len(list_filter(string_split(text,' '), x -> x='a'))
            + len(list_filter(string_split(text,' '), x -> x='of')))
            / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS en_score
       FROM documents"""

  /** Quality scoring: token count, type/token ratio, stopword ratio, mean
    * token length — the standard webtext quality features (length/punct/
    * stopword family). */
  def qualityScore(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "of", "and", "in")
    val nTok = size(toks).cast("double")
    val stopCnt = size(filter(toks, x => x.isin(stop.map(lit): _*))).cast("double")
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(size(array_distinct(toks)) / nTok, 6).as("ttr"),
      round(stopCnt / nTok, 6).as("stop_ratio"),
      round((length(col("text")) - size(toks) + 1) / nTok, 6).as("mean_tok_len"))
  }

  val qualityScoreSql: String =
    """SELECT doc_id,
       len(string_split(text,' ')) AS n_tokens,
       round(len(list_distinct(string_split(text,' ')))
         / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS ttr,
       round(len(list_filter(string_split(text,' '),
           x -> x IN ('the','a','of','and','in')))
         / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS stop_ratio,
       round((length(text) - len(string_split(text,' ')) + 1)
         / CAST(len(string_split(text,' ')) AS DOUBLE), 6) AS mean_tok_len
       FROM documents"""

  /** Token counting: whitespace tokens + a BPE-ish regex tokenizer
    * (letter-runs / digit-runs / single other chars — the
    * `[a-z]+|[0-9]+|[^a-z0-9\s]` split every BPE pre-tokenizer starts from). */
  def tokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      col("doc_id"),
      size(toks).as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("re_tokens"))

  val tokenCountSql: String =
    """SELECT doc_id, len(string_split(text,' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS re_tokens
       FROM documents"""

  /** Document fingerprint: polynomial rolling hash over the token stream
    * (token contribution = ascii(first char)*100 + len, folded with
    * acc*31 + v mod 1e9+7). Order-sensitive — distinguishes permuted
    * near-dups that set-based Jaccard cannot. */
  def fingerprint(s: SparkSession, d: String): DataFrame = {
    val tokVal = transform(toks,
      t => (ascii(substring(t, 1, 1)) * 100 + length(t)).cast("long"))
    Tables.documents(s, d).select(
      col("doc_id"),
      aggregate(tokVal, lit(0L),
        (acc, v) => (acc * 31 + v) % 1000000007L).as("fingerprint"))
  }

  val fingerprintSql: String =
    """SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_transform(string_split(text,' '),
             t -> CAST(ascii(substring(t,1,1))*100 + length(t) AS BIGINT))),
         (acc, v) -> (acc*31 + v) % 1000000007) AS fingerprint
       FROM documents"""

  /** Within-document repetition signals (the Gopher/MassiveText repetition
    * family: fraction of the doc covered by its most frequent token, and
    * the duplicated share of 2-gram / 3-gram occurrences) — the quality
    * gate that kills looping boilerplate before it reaches training data.
    * Pure per-row array expressions: zero shuffles, embarrassingly parallel
    * at 100 TB. The per-token count scan is O(distinct·n) per row — bounded
    * by doc length, never by corpus size. Docs with < 3 tokens carry no
    * 3-gram signal and are skipped (same contract as [[Dedup.shingles]]). */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val n = size(toks).cast("double")
    def grams(k: Int): Column =
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k))))
    def dupFrac(g: Column): Column =
      round((size(g) - size(array_distinct(g))) / size(g).cast("double"), 6)
    val topTok = array_max(transform(array_distinct(toks),
      x => size(filter(toks, y => y === x))))
    Tables.documents(s, d)
      .filter(size(toks) >= 3)
      .select(
        col("doc_id"),
        round(topTok / n, 6).as("top_tok_frac"),
        dupFrac(grams(2)).as("dup_2gram_frac"),
        dupFrac(grams(3)).as("dup_3gram_frac"))
  }

  // — PII scrubbing (the C4/Dolma-style cleanup pass every training-data
  // pipeline runs before release) —

  /** Patterns shared verbatim between the Spark plan and the DuckDB oracle
    * (both engines' regex dialects agree on this subset). */
  private val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Pat  = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PhonePat = "\\+\\d{8,15}"

  /** The deterministic PII salt: doc_id-derived contact strings appended to
    * the text (same generate→operate→check shape as `mm_decode_meta` — the
    * synthetic corpus carries no PII, so the query plants some, identically
    * in Spark and the oracle, and the scrub must find exactly it). Every doc
    * gets an email; ids ≡0 (mod 3) get an IPv4; ids ≡0 (mod 2) get a phone. */
  private def salted: Column = concat(
    col("text"),
    lit(" contact user"), col("doc_id"), lit("@mail.example.com"),
    when(pmod(col("doc_id"), lit(3)) === 0,
      concat(lit(" from 10."), pmod(col("doc_id"), lit(200)), lit("."),
             pmod(col("doc_id") * 7, lit(200)), lit(".4"))).otherwise(lit("")),
    when(pmod(col("doc_id"), lit(2)) === 0,
      concat(lit(" call +1555"),
             lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 7, "0")))
      .otherwise(lit("")))

  /** PII scrub: count and redact emails / IPv4s / phone numbers. Pure
    * row-local regex expressions — zero shuffles, the linear screen shape.
    * Redaction order (emails first) keeps the patterns non-overlapping. */
  def piiScrub(s: SparkSession, d: String): DataFrame = {
    val t = salted
    Tables.documents(s, d).select(
      col("doc_id"),
      regexp_count(t, lit(EmailPat)).as("n_emails"),
      regexp_count(t, lit(Ipv4Pat)).as("n_ips"),
      regexp_count(t, lit(PhonePat)).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPat, "<EMAIL>"),
          Ipv4Pat, "<IP>"),
        PhonePat, "<PHONE>").as("clean_text"))
  }

  val piiScrubSql: String = {
    val t = """text || ' contact user' || doc_id || '@mail.example.com'
       || CASE WHEN doc_id % 3 = 0 THEN ' from 10.' || (doc_id % 200) || '.'
               || ((doc_id * 7) % 200) || '.4' ELSE '' END
       || CASE WHEN doc_id % 2 = 0 THEN ' call +1555'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 7, '0') ELSE '' END"""
    s"""WITH s AS (SELECT doc_id, $t AS t FROM documents)
       SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
         len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
         len(regexp_extract_all(t, '\\+\\d{8,15}')) AS n_phones,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
           '\\+\\d{8,15}', '<PHONE>', 'g') AS clean_text
       FROM s"""
  }

  val repetitionSql: String =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS t FROM documents
                  WHERE len(string_split(text,' ')) >= 3),
       g AS (SELECT doc_id, t,
         list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]) AS g2,
         list_transform(range(1, len(t)-1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]) AS g3
         FROM d)
       SELECT doc_id,
         round(list_max(list_transform(list_distinct(t),
             x -> len(list_filter(t, y -> y = x))))
           / CAST(len(t) AS DOUBLE), 6) AS top_tok_frac,
         round((len(g2) - len(list_distinct(g2)))
           / CAST(len(g2) AS DOUBLE), 6) AS dup_2gram_frac,
         round((len(g3) - len(list_distinct(g3)))
           / CAST(len(g3) AS DOUBLE), 6) AS dup_3gram_frac
       FROM g"""
}
