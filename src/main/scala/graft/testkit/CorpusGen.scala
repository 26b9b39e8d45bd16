package graft.testkit

import java.sql.Timestamp
import graft.core.Schemas._

/** Deterministic synthetic web-page corpus for the KG-construction pipeline
  * (FIXTURES.md §1-§6). Everything is index-arithmetic — no RNG — so the
  * expected triple set is computable by construction and the corpus is
  * byte-identical across runs and parallelism levels.
  *
  * World model (mirrors the reference's semantics at miniature scale):
  *  - taxonomy: Thing > {Person, Place, Work}; Person > {Scientist, Artist};
  *    Place > {City, Country}; Work > {Film, Book} (≙ DBpedia ontology,
  *    `/root/reference/impl/dbpedia/ontology.py:62-86`)
  *  - disjointness: Person⊥Place, Person⊥Work, Place⊥Work
  *    (≙ `/root/reference/impl/dbpedia/heuristics.py:80-114`)
  *  - per (leaf type, country): one enum list page + one table page, each
  *    listing the same members: `knownPerListing` known entities, 2 unknown
  *    labels (→ NIL; the SAME labels on both pages so connected-components
  *    canonicalization must merge them across pages), and 1 noise item
  *    linking a known entity of a DISJOINT type (so the mined type assertion
  *    must be dropped by the disjointness guard).
  *  - one ambiguous alias ("Ada Prime") shared by two scientists with
  *    asymmetric prior (0.7/0.3) — exercises best-candidate selection; it is
  *    also the planted head-entity skew key (is_hot) for salted joins.
  *  - ~10% non-en pages (must be filtered) and meta sections ("See also")
  *    whose links must NOT become mentions.
  */
object CorpusGen {

  case class World(nCountries: Int = 4, knownPerListing: Int = 6) {
    val leafTypes = Seq("Scientist", "Artist", "Film", "Book")
    /** The planted-AXIOM type: its listings exist for country 0 ONLY, so
      * the two listings that mine it agree on (locatedIn, Country 0) at
      * share 1.0 — the type-level axiom fires (Axioms.typeAxioms) and the
      * restriction flavors serialize. The regular leaf types spread over
      * nCountries countries, so no axiom reaches 0.75 share for them
      * (requires nCountries >= 2). */
    val specialType = "Comet"
    val parentOf = Map(
      "Scientist" -> "Person", "Artist" -> "Person",
      "City" -> "Place", "Country" -> "Place",
      "Film" -> "Work", "Book" -> "Work", "Comet" -> "Work",
      "Person" -> "Thing", "Place" -> "Thing", "Work" -> "Thing")
    val disjoint = Seq(("Person", "Place"), ("Person", "Work"),
                       ("Place", "Work"))

    def countryName(k: Int) = s"Country $k"
    def entName(t: String, k: Int, j: Int) = s"$t ${k * 100 + j}"
    def unknownLabel(t: String, k: Int, j: Int) = s"Mystery $t $k $j"
    /** the disjoint-type noise entity planted into (t, k)'s listings */
    def noiseFor(t: String): String =
      if (t == "Scientist" || t == "Artist") "Film" else "Scientist"

    // — seed KG (≙ DBpedia instance types / relations) —

    def taxonomyEdges: Seq[TypeEdge] =
      parentOf.toSeq.sorted.map { case (c, p) => TypeEdge(c, p) }

    def disjointPairs: Seq[(String, String)] =
      disjoint ++ disjoint.map(_.swap)

    def entityTypes: Seq[EntityType] = {
      val countries = (0 until nCountries)
        .map(k => EntityType(countryName(k), "Country"))
      val ents = for {
        t <- leafTypes; k <- 0 until nCountries; j <- 0 until knownPerListing
      } yield EntityType(entName(t, k, j), t)
      val comets = (0 until knownPerListing)
        .map(j => EntityType(entName(specialType, 0, j), specialType))
      val ada = Seq(EntityType("Ada Prime A", "Scientist"),
                    EntityType("Ada Prime B", "Scientist"))
      countries ++ ents ++ comets ++ ada
    }

    /** seed (sub, pred, obj) object relations: every known entity is
      * locatedIn its country. */
    def seedRelations: Seq[(String, String, String)] =
      (for {
        t <- leafTypes; k <- 0 until nCountries; j <- 0 until knownPerListing
      } yield (entName(t, k, j), Preds.LocatedIn, countryName(k))) ++
        (0 until knownPerListing).map(j =>
          (entName(specialType, 0, j), Preds.LocatedIn, countryName(0))) ++
        Seq(("Ada Prime A", Preds.LocatedIn, countryName(0)),
            ("Ada Prime B", Preds.LocatedIn, countryName(1)))

    /** alias dictionary: every entity name with prior 1.0, plus the
      * ambiguous hot alias "Ada Prime" → {A: 0.7, B: 0.3}. */
    def aliases: Seq[(String, String, Double, Boolean)] =
      entityTypes.map(e => (e.ent, e.ent, 1.0, false)) ++
        Seq(("Ada Prime", "Ada Prime A", 0.7, true),
            ("Ada Prime", "Ada Prime B", 0.3, true))

    // — pages —

    /** listing members of (t, k): (wikilink label, isSubjectItem) */
    def members(t: String, k: Int): Seq[String] = {
      val known = (0 until knownPerListing).map(j => entName(t, k, j))
      val unknown = (0 until 2).map(j => unknownLabel(t, k, j))
      val noise = Seq(entName(noiseFor(t), (k + 1) % nCountries, 0))
      known ++ unknown ++ noise
    }

    /** boilerplate label planted into EVERY listing — the F9
      * frequent-unknown-label filter must drop it (a correct pipeline emits
      * NO triples for it; a broken F9 leaks `new:loremipsumfiller`). */
    val junkLabel = "Lorem Ipsum Filler"

    private def enumBody(t: String, k: Int): String = {
      val items = (members(t, k) :+ junkLabel)
        .map(m => s"* [[$m]] — listed member, R&D note.")
      (Seq(s"== Overview ==",
           s"This page lists every $t of ${countryName(k)}.",
           s"A ${t.toLowerCase(java.util.Locale.ROOT)} is a ${parentOf(t).toLowerCase(java.util.Locale.ROOT)}.",
           s"== Members ==") ++ items ++
       Seq("== See also ==",
           s"* [[${countryName(k)}]]",
           s"* [[${countryName((k + 1) % nCountries)}]]",
           s"* [[Ada Prime]]")).mkString("\n")
    }

    private def tableBody(t: String, k: Int): String = {
      // header row first: row 0 is ALWAYS the header (page_parser.py:416-418),
      // so without it the first member would be swallowed as a header
      val rows = (members(t, k) :+ junkLabel)
        .flatMap(m => Seq("|-", s"| [[$m]] || note"))
      (Seq(s"== Overview ==",
           s"A table of each $t of ${countryName(k)}.",
           s"== Table ==", "{|", "! Member !! Note") ++ rows ++
       Seq("|}")).mkString("\n")
    }

    /** Adversarial table page (F7): rowspan/colspan-affected rows must be
      * skipped (their labels must NOT leak), a <2-cell row must kill its
      * whole table, and a table with <3 data rows must be dropped —
      * while the 3 clean rows still come through. */
    private def spansBody: String =
      Seq("== Spans ==",
          "{|",
          "! Name !! Note",
          "|-",
          "| [[Span Keep A]] || ok",
          "|-",
          "| rowspan=\"2\" | [[Span Keep B]] || ok",
          "|-",
          "| [[Span Orphan X]] under the rowspan",
          "|-",
          "| colspan=\"2\" | [[Span Drop A]]",
          "|-",
          "| [[Span Keep C]] || ok",
          "|}",
          "== Dead ==",
          "{|",
          "! H1 !! H2",
          "|-",
          "| [[Dead Table A]] || x",
          "|-",
          "| [[Dead Table B]] || y",
          "|-",
          "| [[Dead Table C]] || z",
          "|-",
          "| lonely",
          "|}",
          "== Narrow ==",
          "{|",
          "! H1 !! H2",
          "|-",
          "| [[Thin Table A]] || x",
          "|-",
          "| [[Thin Table B]] || y",
          "|}").mkString("\n")

    /** A mixed-type listing per country: the TYPE rule must NOT fire (max
      * type share 1/4 < 0.75) while the RELATION rule must (all 4 linked
      * members share locatedIn country k) — the asymmetric threshold case
      * a regression in either direction shows up in P/R. */
    private def mixedBody(k: Int): String = {
      val items = Seq(
        entName("Scientist", k, 0), entName("Film", k, 0),
        entName("Artist", k, 1), entName("Book", k, 1),
        s"Mixed Mystery $k").map(m => s"* [[$m]] — resident.")
      (Seq("== Mixed ==") ++ items).mkString("\n")
    }

    /** the one page exercising ambiguous-alias linking */
    private def adaBody: String =
      (Seq("== Overview ==", "Famous people called Ada.",
           "== People ==",
           "* [[Ada Prime]] — the famous one.",
           "* [[Ada Prime A]] — pioneer.",
           "* [[Ada Prime B]] — the other one.",
           "* [[Ada Prime AA]] — spelling-redirect mention.")).mkString("\n")

    /** spelling redirects (levenshtein(src,dst) <= 2) folded into the alias
      * dictionary, ≙ `impl/dbpedia/resource.py:290-305`. */
    def redirects: Seq[(String, String)] =
      Seq(("Ada Prime AA", "Ada Prime A"))

    private def escapeHtml(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

    def htmlFor(text: String): Array[Byte] =
      s"<html><body><pre>${escapeHtml(text)}</pre></body></html>"
        .getBytes("UTF-8")

    private val t0 = 1700000000000L

    def pages: Seq[Page] = {
      val listPages = for {
        (t, ti) <- leafTypes.zipWithIndex
        k <- 0 until nCountries
        (kind, body) <- Seq("list" -> enumBody(t, k),
                            "table" -> tableBody(t, k))
      } yield {
        val slug = s"$kind-of-${t.toLowerCase(java.util.Locale.ROOT)}s-of-country-$k"
        val idx = ti * nCountries * 2 + k * 2 + (if (kind == "list") 0 else 1)
        Page(s"https://example.org/$slug", new Timestamp(t0 + idx * 60000L),
             htmlFor(body), body, "en")
      }
      val ada = Page("https://example.org/people-called-ada",
                     new Timestamp(t0 - 60000L), htmlFor(adaBody), adaBody, "en")
      val mixed = (0 until nCountries).map { k =>
        val body = mixedBody(k)
        Page(s"https://example.org/mixed-of-country-$k",
             new Timestamp(t0 - 120000L - k), htmlFor(body), body, "en")
      }
      // non-en pages with UNIQUE unknown labels: if the lang filter breaks,
      // these leak extra `new:geheim...` triples and precision drops.
      val nonEn = (0 until math.max(1, nCountries / 2)).map { k =>
        val t = leafTypes(k % leafTypes.size)
        val items = ((0 until knownPerListing)
          .map(j => entName(t, k, j)) ++ Seq(s"Geheim $k 0", s"Geheim $k 1"))
          .map(m => s"* [[$m]] — Eintrag.")
        val body = (Seq("== Liste ==") ++ items).mkString("\n")
        Page(s"https://example.org/de-liste-$k", new Timestamp(t0 + 999999L + k),
             htmlFor(body), body, "de")
      }
      val spans = Page("https://example.org/span-tables",
                       new Timestamp(t0 - 180000L), htmlFor(spansBody),
                       spansBody, "en")
      // the axiom type's single listing pair (country 0 only)
      val comets = Seq("list" -> enumBody(specialType, 0),
                       "table" -> tableBody(specialType, 0)).zipWithIndex
        .map { case ((kind, body), i) =>
          Page(s"https://example.org/$kind-of-comets-of-country-0",
               new Timestamp(t0 + 888888L + i * 60000L),
               htmlFor(body), body, "en")
        }
      listPages ++ comets ++ Seq(ada, spans) ++ mixed ++ nonEn
    }

    // — expected pipeline output (computed from the same parameters) —

    private def key(s: String) = graft.core.Normalize.AliasKeyExpr.key(s)
    private def newEnt(label: String) = s"new:${key(label)}"
    private def ancestors(t: String): Seq[String] =
      Iterator.iterate(Option(t))(o => o.flatMap(parentOf.get))
        .takeWhile(_.isDefined).flatten.toSeq.drop(1) // exclude t itself

    /** All seed tables as DataFrames, the shape Pipeline.run consumes. */
    def seeds(spark: org.apache.spark.sql.SparkSession): graft.Pipeline.Seeds = {
      import spark.implicits._
      graft.Pipeline.Seeds(
        aliases = aliases.toDF("alias", "ent", "freq", "is_hot"),
        entityTypes = entityTypes.toDS().toDF("ent", "tpe"),
        taxonomyEdges = taxonomyEdges.toDS().toDF(),
        disjointPairs = disjointPairs.toDF("type_a", "type_b"),
        seedRelations = seedRelations.toDF("sub", "pred", "obj"),
        redirects = redirects.toDF("src", "dst"))
    }

    /** Expected Hearst hypernym counts from the enum pages' prose
      * ("A <type> is a <parent>." once per enum page). */
    def expectedHypernyms: Seq[(String, String, Long)] =
      leafTypes.map(t =>
        (t.toLowerCase(java.util.Locale.ROOT), parentOf(t).toLowerCase(java.util.Locale.ROOT), nCountries.toLong)) :+
        ((specialType.toLowerCase(java.util.Locale.ROOT), parentOf(specialType).toLowerCase(java.util.Locale.ROOT), 1L))

    /** The exact triple set a correct pipeline must emit. */
    def expectedTriples: Seq[Triple] = {
      val out = scala.collection.mutable.LinkedHashSet[Triple]()
      def listingBlock(t: String, k: Int): Unit = {
        val ms = members(t, k)
        val known = ms.filter(m => m.startsWith(t + " "))
        val unknowns = ms.filter(_.startsWith("Mystery"))
        val noise = ms.filterNot(known.contains).filterNot(unknowns.contains)
        // labels: every linked/new subject entity gets its majority label
        known.foreach(m => out += Triple(m, Preds.Label, m, true))
        noise.foreach(m => out += Triple(m, Preds.Label, m, true))
        unknowns.foreach(m => out += Triple(newEnt(m), Preds.Label, m, true))
        // type rule: majority type t share = known/(known+noise) >= 0.75 →
        // assert t to members lacking it; disjoint-guard kills the noise
        // entity's assertion; new entities get t + transitive ancestors.
        unknowns.foreach { m =>
          out += Triple(newEnt(m), Preds.Type, t, false)
          ancestors(t).foreach(a => out += Triple(newEnt(m), Preds.Type, a, false))
        }
        // relation rule: locatedIn country k share >= 0.75 → assert to
        // members lacking it: unknowns and the noise entity.
        val c = countryName(k)
        unknowns.foreach(m => out += Triple(newEnt(m), Preds.LocatedIn, c, false))
        noise.foreach(m => out += Triple(m, Preds.LocatedIn, c, false))
      }
      for (t <- leafTypes; k <- 0 until nCountries) listingBlock(t, k)
      listingBlock(specialType, 0)
      // mixed listings: type rule blocked (share 1/4), relation rule fires
      // (all 4 linked share locatedIn country k) → the new entity gets a
      // label + locatedIn but NO types.
      for (k <- 0 until nCountries) {
        val m = s"Mixed Mystery $k"
        out += Triple(newEnt(m), Preds.Label, m, true)
        out += Triple(newEnt(m), Preds.LocatedIn, countryName(k), false)
      }
      // the Ada page: listing has 3 items, all linked (no unknowns);
      // "Ada Prime" resolves to the higher-prior entity A. Linked types:
      // {A:Scientist, A:Scientist, B:Scientist} → type rule fires but both
      // already have Scientist → nothing new; relation rule: A:c0,A:c0,B:c1 →
      // majority share 2/3 < 0.75 → no relation. Labels: majority label per
      // entity — A has mentions "Ada Prime" + "Ada Prime A" (tie → lexical
      // min), B has "Ada Prime B".
      out += Triple("Ada Prime A", Preds.Label, "Ada Prime", true)
      out += Triple("Ada Prime B", Preds.Label, "Ada Prime B", true)
      // the spans page: only the 3 clean data rows survive (all unknown →
      // NIL label triples, no linked members → no rules); every
      // Orphan/Drop/Dead/Thin label leaking here is an F7 bug caught by P/R
      Seq("Span Keep A", "Span Keep B", "Span Keep C").foreach { m =>
        out += Triple(newEnt(m), Preds.Label, m, true)
      }
      out ++= expectedProvenance
      out ++= expectedOntology
      out.toSeq
    }

    /** Ontology-flavor triples (classes, subClassOf, disjointness,
      * predicate typing, the planted restriction and its derived facts —
      * ≙ serialize.py:85-146,209-220), computed from the same parameters. */
    def expectedOntology: Seq[Triple] = {
      val out = scala.collection.mutable.LinkedHashSet[Triple]()
      // every non-root node is an owl:Class with a label (root "Thing" is
      // excluded, include_root=False discipline)
      parentOf.keySet.toSeq.sorted.foreach { t =>
        out += Triple(t, Preds.Type, "owl:Class", false)
        out += Triple(t, Preds.Label, t, true)
      }
      parentOf.toSeq.sorted.foreach { case (c, p) =>
        out += Triple(c, Preds.SubClassOf, p, false)
      }
      disjoint.foreach { case (a, b) =>
        out += Triple(if (a < b) a else b, "owl:disjointWith",
                      if (a < b) b else a, false)
      }
      out += Triple(Preds.LocatedIn, Preds.Type, "owl:ObjectProperty", false)
      // the planted axiom (specialType, locatedIn, Country 0): its single
      // restriction definition + subClassOf + the facts on its seed
      // entities (the mined Mystery entities' facts coincide with the
      // relation-rule rows already expected)
      val r = s"RestrictionHasValue_locatedIn_${countryName(0)}"
      out += Triple(r, Preds.Type, "owl:Restriction", false)
      out += Triple(r, Preds.Label,
                    s"Restriction onProperty=locatedIn hasValue=${countryName(0)}",
                    true)
      out += Triple(r, "owl:onProperty", Preds.LocatedIn, false)
      out += Triple(r, "owl:hasValue", countryName(0), false)
      out += Triple(specialType, Preds.SubClassOf, r, false)
      (0 until knownPerListing).foreach(j =>
        out += Triple(entName(specialType, 0, j), Preds.LocatedIn,
                      countryName(0), false))
      out.toSeq
    }

    /** Provenance rows (ent, wasDerivedFrom, page url) for every surviving
      * subject mention — computed from the same page-construction
      * parameters (≙ serialize.py:231-239). */
    def expectedProvenance: Seq[Triple] = {
      def listUrl(kind: String, t: String, k: Int) =
        s"https://example.org/$kind-of-${t.toLowerCase(java.util.Locale.ROOT)}s-of-country-$k"
      val out = scala.collection.mutable.LinkedHashSet[Triple]()
      def memberProv(t: String, k: Int, kind: String): Unit = {
        val url = listUrl(kind, t, k)
        members(t, k).foreach { m =>
          val ent = if (m.startsWith("Mystery")) newEnt(m) else m
          out += Triple(ent, Preds.WasDerivedFrom, url, false)
        }
      }
      for (t <- leafTypes; k <- 0 until nCountries;
           kind <- Seq("list", "table")) memberProv(t, k, kind)
      for (kind <- Seq("list", "table")) memberProv(specialType, 0, kind)
      for (k <- 0 until nCountries) {
        val url = s"https://example.org/mixed-of-country-$k"
        Seq(entName("Scientist", k, 0), entName("Film", k, 0),
            entName("Artist", k, 1), entName("Book", k, 1)).foreach(e =>
          out += Triple(e, Preds.WasDerivedFrom, url, false))
        out += Triple(newEnt(s"Mixed Mystery $k"), Preds.WasDerivedFrom,
                      url, false)
      }
      val adaUrl = "https://example.org/people-called-ada"
      out += Triple("Ada Prime A", Preds.WasDerivedFrom, adaUrl, false)
      out += Triple("Ada Prime B", Preds.WasDerivedFrom, adaUrl, false)
      val spansUrl = "https://example.org/span-tables"
      Seq("Span Keep A", "Span Keep B", "Span Keep C").foreach(m =>
        out += Triple(newEnt(m), Preds.WasDerivedFrom, spansUrl, false))
      // ONTOLOGY-CLASS provenance (serialize.py:158-164): each mined type
      // rule derives its class from the listing's page. The (t, k) type
      // rule fires on both listing kinds (6 of 7 linked subjects share t);
      // the ada listing mines Scientist (2/2); mixed (1/4 share) and spans
      // (no linked subjects) mine nothing.
      for (t <- leafTypes; k <- 0 until nCountries;
           kind <- Seq("list", "table"))
        out += Triple(t, Preds.WasDerivedFrom, listUrl(kind, t, k), false)
      for (kind <- Seq("list", "table"))
        out += Triple(specialType, Preds.WasDerivedFrom,
                      listUrl(kind, specialType, 0), false)
      out += Triple("Scientist", Preds.WasDerivedFrom, adaUrl, false)
      out.toSeq
    }

    /** Expected triples in ScoredEd mode with meThreshold = 0.25 —
      * hand-computed from the reference's split semantics
      * (`greedy_clustering.py:83-102`): lowering the ME threshold admits
      * the 0.3-prior edge "Ada Prime"→B, so the Ada component holds TWO
      * entities and is split by best-path score. The "Ada Prime" mention's
      * best path is 0.7 (direct edge to A) — NOT > 0.75 — so it is demoted
      * to a NIL singleton:
      *  - A's majority label becomes "Ada Prime A" (tie between
      *    {"Ada Prime A", "Ada Prime AA"}, lexical min);
      *  - a new entity new:adaprime appears with label "Ada Prime" and
      *    mined types Scientist (the ada listing's type rule: 2/2 linked
      *    subjects are Scientists) + transitive Person, Thing.
      * Everything else is identical — every other alias has prior 1.0.
      * At DEFAULT thresholds the Ada component has ONE entity (B's 0.3
      * edge is cut) and the validity rule passes it through whole, so the
      * scored output equals [[expectedTriples]] exactly. */
    def expectedTriplesScoredSplit: Seq[Triple] = {
      val ada = newEnt("Ada Prime")
      expectedTriples
        .filterNot(_ == Triple("Ada Prime A", Preds.Label, "Ada Prime", true)) ++
        Seq(Triple("Ada Prime A", Preds.Label, "Ada Prime A", true),
            Triple(ada, Preds.Label, "Ada Prime", true),
            Triple(ada, Preds.Type, "Scientist", false),
            Triple(ada, Preds.Type, "Person", false),
            Triple(ada, Preds.Type, "Thing", false),
            // the demoted mention's new entity derives from the ada page
            Triple(ada, Preds.WasDerivedFrom,
                   "https://example.org/people-called-ada", false))
    }
  }

  val default: World = World()
}
