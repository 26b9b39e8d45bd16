package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{NtCodec, Tables}
import graft.sources.NifSource

/** Driver-contract queries for the NIF corpus source (S4): documents →
  * deterministic NIF N-Triples lines (the generate step, exactly the
  * DBpedia `nif_context` layout the reference reads) → [[NifSource]] parse
  * and subject assembly → rows DuckDB can derive straight from `documents`.
  * Same generate→operate→check shape as `mm_decode_meta`: the oracle pins
  * the whole encode/parse/assemble path without needing a file.
  */
object NifQueries {

  private val Base = "http://graft.example.org/resource/"
  private val Query = "?dbpv=2026-08&nif=context"

  /** The python-whitespace class [[NtCodec.escapeLiteralJava]] squashes
    * (`Character.isWhitespace ∪ isSpaceChar ∪ NEL`) — ONE definition in
    * Java-regex form (the Spark squash / generated endIndex) and one in
    * RE2 form (the DuckDB oracle), so the literal round-trip, the
    * endIndex, and the oracle text can never disagree on what counts as
    * whitespace (ADVICE r4: a plain `\s` diverged from the escaper on
    * U+00A0/U+2007/U+202F/NEL text). */
  private val WsJava = "[\\p{javaWhitespace}\\p{javaSpaceChar}\\u0085]+"
  private[graft] val WsDuck = """[\t\n\x0B\f\r\x1C-\x1F\x{0085}\p{Z}]+"""

  /** Whitespace squash identical to the literal escaper's. */
  private[graft] def squash(c: Column): Column =
    trim(regexp_replace(c, WsJava, " "))

  private def ctxIri(docId: Column): Column =
    concat(lit("<" + Base), docId.cast("string"), lit(Query + ">"))

  private def line(subj: Column, pred: String, obj: Column): Column =
    concat(subj, lit(" <" + pred + "> "), obj, lit(" ."))

  private def typedInt(c: Column): Column =
    concat(lit("\""), c.cast("string"),
      lit("\"^^<http://www.w3.org/2001/XMLSchema#nonNegativeInteger>"))

  private def langLit(c: Column): Column =
    concat(lit("\""), NtCodec.escapeLiteral(c), lit("\"@en"))

  /** One `value` column of NIF context-block NT lines (type, beginIndex,
    * endIndex, isString, sourceUrl — the DBpedia nif_context layout). */
  def contextLines(docs: DataFrame): DataFrame = {
    val s = ctxIri(col("doc_id"))
    val txt = squash(col("text"))
    docs.select(explode(array(
      line(s, NifSource.RdfType, lit("<" + NifSource.NifCore + "Context>")),
      line(s, NifSource.NifCore + "beginIndex", typedInt(lit(0))),
      line(s, NifSource.NifCore + "endIndex", typedInt(length(txt))),
      line(s, NifSource.NifCore + "isString", langLit(col("text"))),
      line(s, NifSource.NifCore + "sourceUrl",
        concat(lit("<http://example.org/page/"), col("doc_id"), lit(">")))
    )).as("value"))
  }

  /** Phrase-annotation NT lines: one linked mention per document — the
    * first token of the squashed text, anchored at char 0. */
  def phraseLines(docs: DataFrame): DataFrame = {
    val tok = split(squash(col("text")), " ").getItem(0)
    val p = concat(lit("<" + Base), col("doc_id").cast("string"),
      lit("?dbpv=2026-08&nif=phrase&char=0,"), length(tok), lit(">"))
    docs.filter(length(squash(col("text"))) > 0).select(explode(array(
      line(p, NifSource.RdfType, lit("<" + NifSource.NifCore + "Phrase>")),
      line(p, NifSource.NifCore + "referenceContext", ctxIri(col("doc_id"))),
      line(p, NifSource.NifCore + "beginIndex", typedInt(lit(0))),
      line(p, NifSource.NifCore + "endIndex", typedInt(length(tok))),
      line(p, NifSource.NifCore + "anchorOf", langLit(tok)),
      line(p, NifSource.ItsRdf + "taIdentRef",
        concat(lit("<" + Base), NtCodec.encodeResourceName(tok), lit(">")))
    )).as("value"))
  }

  /** S4 roundtrip: generate the context block per document, parse it back
    * through the real NifSource path, and surface what the reference's
    * `_retrieve_plaintexts` consumes. */
  def contextRoundtrip(s: SparkSession, d: String): DataFrame = {
    graft.core.Normalize.register(s)
    NifSource.contexts(NifSource.parseRaw(contextLines(Tables.documents(s, d))))
      .select(col("resource"), col("text"), col("begin_index"),
              col("end_index"), col("source_url"))
  }

  val contextRoundtripSql: String =
    s"""SELECT CAST(doc_id AS VARCHAR) AS resource,
              trim(regexp_replace(text, '$WsDuck', ' ', 'g')) AS text,
              0 AS begin_index,
              length(trim(regexp_replace(text, '$WsDuck', ' ', 'g'))) AS end_index,
              'http://example.org/page/' || doc_id AS source_url
       FROM documents"""

  /** S4 phrase annotations: generate one linked mention per document, parse
    * back through [[NifSource.mentions]]. */
  def mentionsRoundtrip(s: SparkSession, d: String): DataFrame = {
    graft.core.Normalize.register(s)
    NifSource.mentions(NifSource.parseRaw(phraseLines(Tables.documents(s, d))))
      .select(col("resource"), col("anchor_of"), col("begin_index"),
              col("end_index"), col("entity"))
  }

  /** S4's real downstream (`nif_parser.py:49-63`): NIF contexts → Hearst
    * span pairs → surface-form gate → word × entity-type counts. The corpus
    * is synthesized from `part` (the documents table is word-soup with no
    * copular patterns): each page's prose names its own entity (`pK`) under
    * a two-word hypernym phrase, plus a decoy pair whose hyponym is NOT a
    * surface form of the page entity — the gate must drop it. */
  def typeLexicalisations(s: SparkSession, d: String): DataFrame = {
    graft.core.Normalize.register(s)
    import s.implicits._
    val part = Tables.part(s, d)
    val docs = part.select(col("p_partkey").as("doc_id"),
                           fixtureText(col("p_partkey"), lower(col("p_name"))))
    val ctxs = graft.sources.NifSource
      .contexts(graft.sources.NifSource.parseRaw(contextLines(docs)))
      .select(col("resource"), col("text")).as[(String, String)]
    val surfaceForms = part.select(
      concat(lit("p"), col("p_partkey")).as("surface_form"),
      col("p_partkey").cast("string").as("ent"))
    val entityTypes = part.select(
        col("p_partkey").cast("string").as("ent"),
        lower(col("p_brand")).as("tpe"))
      .unionByName(part.select(
        col("p_partkey").cast("string").as("ent"),
        concat(lit("t"), col("p_size") % 5).as("tpe")))
    graft.mine.Hearst.typeLexCorpusCounts(ctxs, surfaceForms, entityTypes)
  }

  /** The per-page fixture prose, sentence by sentence a tripwire for
    * inventory drift (ADVICE r4: the old fixture could not trigger any
    * pattern the Spark and SQL inventories disagreed on):
    *  1. "<name>s such as pK fill shelves"  — such-as, gated THROUGH;
    *  2. "goods particularly pK sell well"  — particularly (in the
    *     reference's 8-pattern inventory; a SQL list still pinning the old
    *     7-pattern set counts nothing here and hash-fails);
    *  3. "wares other than pK vanish"       — other-than (same tripwire);
    *  4. "such widgets as pK rust"          — the NON-reference classic
    *     "such NP as NP": NEITHER side may match it (re-adding it to
    *     either list hash-fails);
    *  5. "things such as stuff exist"       — decoy: hyponym is not a
    *     surface form of the page entity; the gate must drop it. */
  private def fixtureText(key: Column, nameLower: Column): Column = {
    val k = key.cast("string")
    concat(nameLower, lit("s such as p"), k, lit(" fill shelves."),
           lit(" goods particularly p"), k, lit(" sell well."),
           lit(" wares other than p"), k, lit(" vanish."),
           lit(" such widgets as p"), k, lit(" rust."),
           lit(" things such as stuff exist.")).as("text")
  }

  private val fixtureTextSql: String =
    "lower(p_name) || 's such as p' || p_partkey || ' fill shelves." +
    " goods particularly p' || p_partkey || ' sell well." +
    " wares other than p' || p_partkey || ' vanish." +
    " such widgets as p' || p_partkey || ' rust." +
    " things such as stuff exist.'"

  val typeLexicalisationsSql: String = {
    val np = "([a-z][a-z0-9]*(?: [a-z][a-z0-9]*){0,2}?)"
    // the reference's EXACT 8-pattern inventory, in lock-step with
    // graft.mine.Hearst.patterns (hearst_matcher.py:6-35): no
    // "such NP as NP", WITH particularly / other-than (ADVICE r4)
    val patterns: Seq[(String, Int, Int)] = Seq(
      (s"$np is (?:a|an) $np", 1, 2),
      (s"$np such as $np", 2, 1),
      (s"$np and other $np", 1, 2),
      (s"$np or other $np", 1, 2),
      (s"$np including $np", 2, 1),
      (s"$np especially $np", 2, 1),
      (s"$np particularly $np", 2, 1),
      (s"$np other than $np", 2, 1))
    val perPattern = patterns.map { case (p, si, oi) =>
      s"""SELECT resource, pair[1] AS sub, pair[2] AS obj_span
          FROM sents, unnest(list_zip(regexp_extract_all(s, '$p', $si),
                                      regexp_extract_all(s, '$p', $oi))) AS t(pair)"""
    }.mkString(" UNION ALL ")
    s"""WITH corpus AS (SELECT CAST(p_partkey AS VARCHAR) AS resource,
          $fixtureTextSql AS text
          FROM part),
        sents AS (
          SELECT resource,
                 trim(regexp_replace(regexp_replace(sent, '[^a-z0-9 ]', ' ', 'g'),
                                     '\\s+', ' ', 'g')) AS s
          FROM (SELECT resource, unnest(string_split_regex(lower(text), '[.!?]')) AS sent
                FROM corpus)),
        pairs AS ($perPattern),
        sf AS (SELECT 'p' || p_partkey AS surface_form,
                      CAST(p_partkey AS VARCHAR) AS ent FROM part),
        ty AS (SELECT CAST(p_partkey AS VARCHAR) AS ent, lower(p_brand) AS tpe FROM part
               UNION ALL
               SELECT CAST(p_partkey AS VARCHAR), 't' || (p_size % 5) FROM part),
        gated AS (SELECT p.resource, p.obj_span FROM pairs p
                  JOIN sf ON sf.surface_form = p.sub AND sf.ent = p.resource),
        words AS (SELECT ty.tpe, unnest(string_split(g.obj_span, ' ')) AS w
                  FROM gated g JOIN ty ON ty.ent = g.resource),
        sing AS (SELECT tpe,
                   CASE WHEN regexp_matches(w, '(ss|us|is)$$') THEN w
                        WHEN regexp_matches(w, 'ies$$') THEN left(w, length(w) - 3) || 'y'
                        WHEN regexp_matches(w, '(ches|shes|xes)$$') THEN left(w, length(w) - 2)
                        WHEN regexp_matches(w, 's$$') THEN left(w, length(w) - 1)
                        ELSE w END AS word
                 FROM words)
        SELECT word, tpe, count(*) AS cnt FROM sing
        WHERE word NOT IN ('', 'a', 'an', 'the', 'of', 'and', 'or', 'is', 'are',
                           'as', 'such', 'other', 'including', 'especially')
        GROUP BY 1, 2"""
  }

  val mentionsRoundtripSql: String =
    s"""WITH sq AS (SELECT doc_id,
           trim(regexp_replace(text, '$WsDuck', ' ', 'g')) AS t FROM documents)
       SELECT CAST(doc_id AS VARCHAR) AS resource,
              split_part(t, ' ', 1) AS anchor_of,
              0 AS begin_index,
              length(split_part(t, ' ', 1)) AS end_index,
              replace(split_part(t, ' ', 1), '_', ' ') AS entity
       FROM sq WHERE length(t) > 0"""
}
