package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** NIF 2.0 corpus source (S4 — reference: `impl/wikipedia/nif_parser.py:66-82`
  * loads the DBpedia `nif_context` dump with pynif and yields one
  * (resource, plaintext) per `nif:Context`; the resource is the context IRI
  * with its `?dbpv=…&nif=context` query suffix stripped, `nif_parser.py:72`,
  * and the plaintext is `nif:isString` with newlines and bracket content
  * removed, `nif_parser.py:79-81`).
  *
  * Spark-first shape: NIF is just an RDF graph, so the file is N-Triples
  * lines → a row-local raw-triple parse ([[parseRaw]]: regex + the native
  * unescape expression, full IRIs kept verbatim — the graft-base decode in
  * [[NtSource.parse]] would be wrong for a foreign namespace) → ONE
  * subject-keyed aggregation pivoting the predicate soup into typed rows.
  * Context subjects are unique per page, phrase subjects unique per
  * annotation, so the assembly shuffle is balanced by construction; at
  * 100 TB it is the unavoidable "group the triples by subject" pass and the
  * only shuffle this source performs. `spark.read.text` gives splittable
  * scans for plain and .bz2 files (the DBpedia dumps' codec) for free.
  */
object NifSource {

  val NifCore = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
  val ItsRdf  = "http://www.w3.org/2005/11/its/rdf#"
  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Raw triple parse: (subj, pred, obj, is_literal) with IRIs verbatim;
    * literal objects unescaped. Non-triple lines (comments, blanks) drop. */
  def parseRaw(lines: DataFrame): DataFrame = {
    // ONE pass: the former obj/literal branch UNION scanned (and, for
    // generated line frames, re-generated) the input twice and re-ran the
    // object regex on both sides; the match flags are materialized in
    // their own projection so each rlike runs once per row and the
    // branches collapse into per-column CASE WHEN
    lines
      .select(col("value"),
              col("value").rlike(NtSource.objPat).as("is_obj"),
              col("value").rlike(NtSource.litPat).as("is_lit"))
      .filter(col("is_obj") || col("is_lit"))
      .select(
        when(col("is_obj"), regexp_extract(col("value"), NtSource.objPat, 1))
          .otherwise(regexp_extract(col("value"), NtSource.litPat, 1))
          .as("subj"),
        when(col("is_obj"), regexp_extract(col("value"), NtSource.objPat, 2))
          .otherwise(regexp_extract(col("value"), NtSource.litPat, 2))
          .as("pred"),
        when(col("is_obj"), regexp_extract(col("value"), NtSource.objPat, 3))
          .otherwise(call_function("nt_unescape_literal",
            regexp_extract(col("value"), NtSource.litPat, 3)))
          .as("obj"),
        (!col("is_obj")).as("is_literal"))
  }

  private def nif(name: String): Column = col("pred") === lit(NifCore + name)

  /** The resource a NIF IRI annotates: strip the query suffix, then decode
    * the name exactly like the reference's uri2iri + iri2name
    * (`nif_parser.py:72`, `impl/util/rdf.py:110-120`) — base strip,
    * %XX UTF-8 decode, '_'→' '. `base` is the dump's resource namespace
    * (ADVICE r4: a DBpedia `nif_context` dump uses
    * `http://dbpedia.org/resource/` — stripping only the graft base left
    * resource keys as mangled full IRIs). */
  def resourceOf(iri: Column,
                 base: String = NtSource.DefaultResourceBase): Column =
    NtSource.decodeName(substring_index(iri, "?", 1), base)

  /** Assemble `nif:Context` rows →
    * (resource, context_iri, text, begin_index, end_index, source_url).
    * `text` is the raw `nif:isString`; apply [[plainText]] for the
    * reference's parse-ready cleanup. `base`: the dump's resource
    * namespace (see [[resourceOf]]). */
  def contexts(triples: DataFrame,
               base: String = NtSource.DefaultResourceBase): DataFrame =
    triples
      // prune the soup to NIF predicates before the shuffle
      .filter(col("pred").startsWith(NifCore))
      .groupBy(col("subj"))
      .agg(
        max(when(nif("isString"), col("obj"))).as("text"),
        max(when(nif("beginIndex"), col("obj"))).cast("long").as("begin_index"),
        max(when(nif("endIndex"), col("obj"))).cast("long").as("end_index"),
        max(when(nif("sourceUrl") && !col("is_literal"), col("obj"))).as("source_url"))
      .filter(col("text").isNotNull) // contexts carry isString; phrases don't
      .select(
        resourceOf(col("subj"), base).as("resource"),
        col("subj").as("context_iri"),
        col("text"), col("begin_index"), col("end_index"), col("source_url"))

  /** Assemble phrase annotations (`nif:anchorOf` + `itsrdf:taIdentRef`) →
    * (resource, anchor_of, begin_index, end_index, entity). `entity` is the
    * linked resource name (decoded), null for unlinked phrases. `base`:
    * the dump's resource namespace (see [[resourceOf]]). */
  def mentions(triples: DataFrame,
               base: String = NtSource.DefaultResourceBase): DataFrame =
    triples
      .filter(col("pred").startsWith(NifCore) ||
              col("pred") === lit(ItsRdf + "taIdentRef"))
      .groupBy(col("subj"))
      .agg(
        max(when(nif("anchorOf"), col("obj"))).as("anchor_of"),
        max(when(nif("beginIndex"), col("obj"))).cast("long").as("begin_index"),
        max(when(nif("endIndex"), col("obj"))).cast("long").as("end_index"),
        max(when(nif("referenceContext") && !col("is_literal"), col("obj"))).as("ctx"),
        max(when(col("pred") === lit(ItsRdf + "taIdentRef") && !col("is_literal"),
                 col("obj"))).as("ta_iri"))
      .filter(col("anchor_of").isNotNull) // phrases carry anchorOf; contexts don't
      .select(
        resourceOf(col("ctx"), base).as("resource"),
        col("anchor_of"), col("begin_index"), col("end_index"),
        NtSource.decodeName(col("ta_iri"), base).as("entity"))

  /** The reference's plaintext cleanup before Hearst parsing
    * (`nif_parser.py:79-81` + `impl/util/nlp.py:76-86`): newlines → space,
    * then single-level '(…)' and '[…]' content removed with its
    * surrounding whitespace (substitute=''). Row-local, codegen'd. */
  def plainText(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, "\n", " "),
        "\\s*\\([^()]*\\)\\s*", ""),
      "\\s*\\[[^\\[\\]]*\\]\\s*", "")

  /** File entry point: NIF N-Triples file(s) → context rows. */
  def readContexts(spark: SparkSession, path: String,
                   base: String = NtSource.DefaultResourceBase): DataFrame =
    contexts(parseRaw(spark.read.text(path)), base)

  /** Adapt a NIF dump to the north-rule page table
    * (url, warc_ts, html, text, lang) so [[graft.Pipeline.run]] consumes a
    * NIF corpus directly. The context plaintext becomes the golden `text`;
    * `html` is the text re-ESCAPED (& < > → entities) so that the
    * pipeline's pure extraction chain
    * ([[graft.ingest.TextExtract.textFromHtml]]: strip tags, decode
    * entities) inverts it exactly — the byte-identity invariant holds by
    * construction. url prefers the dump's `nif:sourceUrl`, falling back to
    * the resource IRI. NOTE: the pipeline's extraction stage keeps
    * lang='en' only — pass a different `lang` only when the downstream
    * filter is widened too, or the run silently emits nothing. */
  def pagesFromNif(spark: SparkSession, path: String,
                   crawlTs: java.sql.Timestamp,
                   lang: String = "en",
                   base: String = NtSource.DefaultResourceBase): DataFrame = {
    val text = plainText(col("text"))
    val escaped = regexp_replace(regexp_replace(regexp_replace(
      text, "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    readContexts(spark, path, base).select(
      coalesce(col("source_url"),
               XmlDumpSource.resourceIri(col("resource"))).as("url"),
      lit(crawlTs).as("warc_ts"),
      encode(escaped, "UTF-8").as("html"),
      text.as("text"),
      lit(lang).as("lang"))
  }

  /** The reference's end-to-end NIF wiring (`nif_parser.py:18-45`
    * `extract_wiki_corpus_resources`): dump file → contexts → bracket/
    * newline cleanup → Hearst corpus counts, i.e. the wiki-side hypernym
    * evidence [[graft.mine.Hearst.mergeSources]] votes with (A6). */
  def wikiHypernymCounts(spark: SparkSession, path: String,
                         base: String = NtSource.DefaultResourceBase): DataFrame = {
    import spark.implicits._
    graft.mine.Hearst.corpusCounts(
      readContexts(spark, path, base)
        .select(col("resource"), plainText(col("text")).as("text"))
        .as[(String, String)])
  }

  /** File entry point: NIF N-Triples file(s) → phrase-annotation rows. */
  def readMentions(spark: SparkSession, path: String,
                   base: String = NtSource.DefaultResourceBase): DataFrame =
    mentions(parseRaw(spark.read.text(path)), base)

  /** Linked phrase annotations → the alias-table shape
    * [[graft.link.AliasLink.buildDict]] consumes directly
    * (alias, ent, freq, is_hot): anchor texts of linked mentions are the
    * reference's surface-form references; `freq` is the per-alias link
    * share P(ent | anchor); `is_hot` flags aliases whose total mention
    * count reaches `hotCount` (the salted-shuffle skew knob). One count
    * shuffle with map-side combine plus an alias-keyed window over the
    * counted (small) frame. */
  def surfaceForms(mentionRows: DataFrame,
                   hotCount: Long = 1000000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("alias")
    mentionRows.filter(col("entity").isNotNull)
      .groupBy(col("anchor_of").as("alias"), col("entity").as("ent"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("alias"), col("ent"),
        (col("cnt") / sum("cnt").over(w)).as("freq"),
        (sum("cnt").over(w) >= hotCount).as("is_hot"))
  }
}
