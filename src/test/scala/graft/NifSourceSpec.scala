package graft

import org.apache.spark.sql.functions._
import graft.mine.Hearst
import graft.ops.NifQueries
import graft.sources.NifSource

/** S4 NIF corpus source: generate the DBpedia nif_context layout from a
  * tiny corpus, parse it back through the real file path, and check the
  * reference's cleanup semantics (`impl/wikipedia/nif_parser.py:66-82`,
  * `impl/util/nlp.py:76-86`). */
class NifSourceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "a city is a settlement such as paris", "en", "w", 37L),
    (1L, "dogs  and cats are animals", "en", "w", 26L), // double space squashes
    (2L, "quoted \"text\" and a back\\slash survive the literal codec", "en", "w", 57L),
    (3L, "   ", "en", "w", 3L) // whitespace-only: context emitted, no phrase
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private def lines =
    NifQueries.contextLines(docs).unionByName(NifQueries.phraseLines(docs))

  test("file round-trip: write NT, readContexts recovers resource + text") {
    val dir = SparkSuite.tempDir("graft-nif") + "/nif"
    lines.coalesce(1).write.text(dir)
    val ctx = NifSource.readContexts(spark, dir)
      .select("resource", "text", "begin_index", "end_index")
      .as[(String, String, Long, Long)].collect()
      .map { case (r, t, b, e) => r -> ((t, b, e)) }.toMap
    assert(ctx.size == 4)
    assert(ctx("0") == (("a city is a settlement such as paris", 0L, 36L)))
    // whitespace squash is the literal codec's documented normalization
    assert(ctx("1") == (("dogs and cats are animals", 0L, 25L)))
    // escaping round-trips quotes and backslashes bit-exactly
    assert(ctx("2")._1 ==
      "quoted \"text\" and a back\\slash survive the literal codec")
    assert(ctx("3")._1 == "")
  }

  test("file round-trip: readMentions recovers phrase annotations") {
    val dir = SparkSuite.tempDir("graft-nif") + "/nifm"
    lines.coalesce(1).write.text(dir)
    val m = NifSource.readMentions(spark, dir)
      .select("resource", "anchor_of", "begin_index", "end_index", "entity")
      .as[(String, String, Long, Long, String)].collect().toSet
    // one phrase per non-empty doc: the first token, linked to itself
    assert(m == Set(
      ("0", "a", 0L, 1L, "a"),
      ("1", "dogs", 0L, 4L, "dogs"),
      ("2", "quoted", 0L, 6L, "quoted")))
    // linked anchors roll up to the EXACT alias-table shape buildDict eats
    val sf = NifSource.surfaceForms(NifSource.readMentions(spark, dir))
    assert(sf.as[(String, String, Double, Boolean)].collect().toSet ==
      Set(("a", "a", 1.0, false), ("dogs", "dogs", 1.0, false),
          ("quoted", "quoted", 1.0, false)))
    assert(graft.link.AliasLink.buildDict(sf).count() == 3) // consumable as-is
  }

  test("Hearst counts over NIF contexts == counts over squashed raw text") {
    val dir = SparkSuite.tempDir("graft-nif") + "/nifh"
    NifQueries.contextLines(docs).coalesce(1).write.text(dir)
    // the reference wiring (file → contexts → cleanup → counts); plainText
    // is a no-op on this bracket-free fixture, so direct equality holds
    val viaNif = NifSource.wikiHypernymCounts(spark, dir)
      .as[(String, String, Long)].collect().toSet
    val direct = Hearst.corpusCounts(
      docs.select(col("doc_id").cast("string"),
        trim(regexp_replace(col("text"), "\\s+", " "))).as[(String, String)])
      .as[(String, String, Long)].collect().toSet
    assert(viaNif == direct && viaNif.nonEmpty) // "such as", "are" patterns fire
  }

  test("plainText pins the reference cleanup (nlp.py:76-86, substitute='')") {
    val out = Seq(
      "Alan Turing (1912-1954) was a pioneer[1] of computing",
      "no brackets here",
      "line\nbreaks (x) [y] collapse"
    ).toDF("t").select(NifSource.plainText(col("t"))).as[String].collect()
    // \s*\(...\)\s* with substitute='' removes the surrounding whitespace too
    assert(out(0) == "Alan Turingwas a pioneerof computing")
    assert(out(1) == "no brackets here")
    // \n→' ' first (nif_parser.py:79); bracket removal then eats only the
    // whitespace adjacent to each bracket pair, so "line breaks" keeps its
    // space while " (x) " and "[y] " vanish entirely
    assert(out(2) == "line breakscollapse")
  }

  test("type lexicalisations: surface-form gate, stopwords, singularize " +
       "(nif_parser.py:49-63)") {
    val ctxs = Seq(
      ("e1", "big red cities such as metropolis grow. things such as stuff exist."),
      ("e2", "big red cities such as metropolis grow"), // metropolis ∉ sf(e2)
      ("e3", "kings of the realm such as rex rule")     // of/the are stopwords
    ).toDS()
    val sf = Seq(("metropolis", "e1"), ("rex", "e3")).toDF("surface_form", "ent")
    val ty = Seq(("e1", "city"), ("e1", "place"), ("e3", "ruler")).toDF("ent", "tpe")
    val out = Hearst.typeLexCorpusCounts(ctxs, sf, ty)
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(
      ("big", "city", 1L), ("red", "city", 1L), ("city", "city", 1L),
      ("big", "place", 1L), ("red", "place", 1L), ("city", "place", 1L),
      ("realm", "ruler", 1L)))
  }

  test("pagesFromNif yields the north-rule page table; invariant holds") {
    graft.core.Normalize.register(spark)
    val dir = SparkSuite.tempDir("graft-nif") + "/nifp"
    // doc 2 carries & < " \ — the escape/extract inversion must be exact
    NifQueries.contextLines(
      docs.withColumn("text", concat(col("text"), lit(" & <tag> done")))
    ).coalesce(1).write.text(dir)
    val ts = java.sql.Timestamp.valueOf("2026-08-01 00:00:00")
    val pages = NifSource.pagesFromNif(spark, dir, ts)
    assert(pages.schema.map(f => (f.name, f.dataType)) ==
           graft.streaming.StreamingIngest.pageSchema.map(f => (f.name, f.dataType)))
    val ext = graft.ingest.TextExtract.extract(pages)
      .as[(String, String)].collect().toMap
    val golden = pages.select("url", "text").as[(String, String)].collect()
    assert(golden.nonEmpty)
    golden.foreach { case (u, t) => assert(ext(u) == t, u) }
    assert(golden.forall(_._1.startsWith("http://example.org/page/")))
  }

  test("foreign namespaces: non-NIF predicates are pruned, IRIs verbatim") {
    val extra = Seq(
      "<http://x.org/a?nif=context> <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#isString> \"hello world\"@en .",
      "<http://x.org/a?nif=context> <http://purl.org/dc/terms/source> <http://x.org/src> .",
      "# a comment line",
      "not a triple at all"
    ).toDF("value")
    val ctx = NifSource.contexts(NifSource.parseRaw(extra))
    val row = ctx.select("resource", "text", "source_url").as[(String, String, String)].collect()
    assert(row.toSeq == Seq(("http://x.org/a", "hello world", null)))
  }

  test("foreign resource base: DBpedia-style dump decodes to reference-" +
       "shaped entity names (ADVICE r4 — nif_parser.py:72 uri2iri+iri2name)") {
    val nif = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
    val dbr = "http://dbpedia.org/resource/"
    val ctxIri = s"<${dbr}New_York_%28state%29?dbpv=2022-12&nif=context>"
    val phrIri = s"<${dbr}New_York_%28state%29?dbpv=2022-12&nif=phrase&char=0,6>"
    val lines = Seq(
      s"""$ctxIri <${nif}isString> "albany is a city"@en .""",
      s"""$phrIri <${nif}referenceContext> $ctxIri .""",
      s"""$phrIri <${nif}anchorOf> "albany"@en .""",
      s"""$phrIri <http://www.w3.org/2005/11/its/rdf#taIdentRef> <${dbr}Albany%2C_New_York> ."""
    ).toDF("value")
    val ctx = NifSource.contexts(NifSource.parseRaw(lines), base = dbr)
      .select("resource", "text").as[(String, String)].collect()
    assert(ctx.toSeq == Seq(("New York (state)", "albany is a city")))
    val m = NifSource.mentions(NifSource.parseRaw(lines), base = dbr)
      .select("resource", "anchor_of", "entity")
      .as[(String, String, String)].collect()
    assert(m.toSeq == Seq(("New York (state)", "albany", "Albany, New York")))
  }

  test("NifQueries squash mirrors escapeLiteralJava's python-whitespace " +
       "class (ADVICE r4 — U+00A0/U+2007/U+202F/NEL/\\u001C)") {
    val texts = Seq(
      "plain ascii  text",
      "nbsp here", "figure space", "narrow nbsp",
      "nelline", "fsgs", "ideographic　space",
      "  leading and trailing  ", "\t\n mixed   runs \r")
    // for quote/backslash-free input the squash IS the escaper
    val viaCol = texts.toDF("t")
      .select(graft.ops.NifQueries.squash(col("t"))).as[String].collect()
    texts.zip(viaCol).foreach { case (t, got) =>
      assert(got == graft.core.NtCodec.escapeLiteralJava(t), s"input=$t")
    }
  }
}
