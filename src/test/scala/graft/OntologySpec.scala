package graft

import org.apache.spark.sql.functions._
import graft.taxonomy.{Axioms, ValidTags}
import graft.emit.TripleEmit

/** A9 valid tags (+ the RuleMining gate), type-level axioms, and the
  * ontology serialization flavors (r3 VERDICT asks #4 and #5). */
class OntologySpec extends SparkSuite {
  import spark.implicits._

  test("valid tags: probabilities, threshold, multi-hop + diamond inheritance") {
    val mentions = Seq(("e1", "X"), ("e1", "X"), ("e1", "Y"),
                       ("e2", "X"), ("e3", "Y")).toDF("ent", "tag")
    val entTypes = Seq(("e1", "A"), ("e2", "A"), ("e3", "B")).toDF("ent", "tpe")
    val probas = ValidTags.tagProbabilities(mentions, entTypes)
      .as[(String, String, Double)].collect().toSet
    assert(probas == Set(("A", "X", 0.75), ("A", "Y", 0.25), ("B", "Y", 1.0)))
    // C (no entities) inherits A; D inherits via C (multi-hop); E sits under
    // BOTH A and B (diamond) and must take the union
    val edges = Seq(("C", "A"), ("D", "C"), ("E", "A"), ("E", "B"))
      .toDF("child", "parent")
    val valid = ValidTags.validTags(mentions, entTypes, edges, 0.5)
      .as[(String, String)].collect().toSet
    assert(valid == Set(("A", "X"), ("B", "Y"), ("C", "X"), ("D", "X"),
                        ("E", "X"), ("E", "Y")))
  }

  test("valid-tag gate: invalid tag drops; unknown types pass through") {
    val subjects = Seq(
      ("u1", "l1", "m1", "TITLE"), ("u1", "l1", "m2", "NUM"),
      ("u2", "l2", "m3", "NUM"), ("u3", "l3", "m4", "NUM"))
      .toDF("url", "listing_key", "mention_id", "tag")
    val listingTypes = Seq(("u1", "l1", "A"), ("u2", "l2", "Z"))
      .toDF("url", "listing_key", "tpe")
    val valid = Seq(("A", "TITLE")).toDF("tpe", "tag")
    val kept = ValidTags.gateSubjects(subjects, listingTypes, valid)
      .select("mention_id").as[String].collect().toSet
    // m2: tag NUM invalid for A → dropped; m3: type Z has no known tags →
    // kept; m4: listing has no mined type → kept
    assert(kept == Set("m1", "m3", "m4"))
  }

  test("shape tags are deterministic word-shape buckets") {
    val got = Seq("1,200", "NASA 9", "Ada Prime", "mixed Case")
      .toDF("l").select(ValidTags.shapeTag(col("l"))).as[String].collect()
    assert(got.toSeq == Seq("NUM", "ALLCAPS", "TITLE", "OTHER"))
  }

  test("type axioms: share and support gates in both directions") {
    val typeRules = Seq(
      ("u1", "l", "T"), ("u2", "l", "T"), ("u3", "l", "T"), ("u4", "l", "T"),
      ("u5", "l", "U"), ("u6", "l", "U"),
      ("u7", "l", "V")).toDF("url", "listing_key", "tpe")
    val relRules = Seq(
      ("u1", "l", "p", "o"), ("u2", "l", "p", "o"), ("u3", "l", "p", "o"),
      ("u5", "l", "p", "o2"),
      ("u7", "l", "p", "o3")).toDF("url", "listing_key", "pred", "obj")
    val axioms = Axioms.typeAxioms(typeRules, relRules)
      .as[(String, String, String)].collect().toSet
    // T: 3/4 listings agree (>=0.75, support 3) → axiom; U: 1/2 share →
    // no; V: support 1 → no
    assert(axioms == Set(("T", "p", "o")))
  }

  test("axiom facts apply to descendant-or-self types only") {
    val edges = Seq(("B", "A")).toDF("child", "parent")
    val closure = graft.taxonomy.Disjointness.closureWithSelf(edges)
    val entTypes = Seq(("e1", "B"), ("e2", "A"), ("e3", "C"))
      .toDF("ent", "tpe")
    val axioms = Seq(("A", "p", "o")).toDF("tpe", "pred", "obj")
    val facts = Axioms.axiomFacts(axioms, entTypes, closure)
      .as[(String, String, String)].collect().toSet
    // e1 (subtype B <= A) and e2 (self) get the fact; e3 (unrelated) not
    assert(facts == Set(("e1", "p", "o"), ("e2", "p", "o")))
  }

  test("ontology class triples: root excluded, disjointness once") {
    val edges = Seq(("B", "A"), ("C", "A"), ("A", "Root"))
      .toDF("child", "parent")
    val disj = Seq(("B", "C"), ("C", "B")).toDF("type_a", "type_b")
    val got = TripleEmit.ontologyClassTriples(edges, disj)
      .as[(String, String, String, Boolean)].collect().toSet
    val expected = Set(
      ("A", "rdf:type", "owl:Class", false),
      ("B", "rdf:type", "owl:Class", false),
      ("C", "rdf:type", "owl:Class", false),
      ("A", "rdfs:label", "A", true),
      ("B", "rdfs:label", "B", true),
      ("C", "rdfs:label", "C", true),
      ("B", "rdfs:subClassOf", "A", false),
      ("C", "rdfs:subClassOf", "A", false),
      ("A", "rdfs:subClassOf", "Root", false),
      ("B", "owl:disjointWith", "C", false))
    assert(got == expected)
  }

  test("restriction triples: shared definition + NT goldens") {
    // two axioms sharing (pred, obj) → ONE restriction definition,
    // TWO subClassOf rows (serialize.py's defined_restrictions dedup)
    val axioms = Seq(("T1", "clg:locatedIn", "Country 0"),
                     ("T2", "clg:locatedIn", "Country 0"))
      .toDF("tpe", "pred", "obj")
    val t = TripleEmit.restrictionTriples(axioms).distinct()
    val r = "RestrictionHasValue_locatedIn_Country 0"
    assert(t.filter(col("pred") === "rdf:type").count() == 1)
    assert(t.filter(col("pred") === "rdfs:subClassOf").count() == 2)
    val rows = t.as[(String, String, String, Boolean)].collect().toSet
    assert(rows.contains((r, "owl:onProperty", "clg:locatedIn", false)))
    assert(rows.contains((r, "owl:hasValue", "Country 0", false)))
    assert(rows.contains(
      (r, "rdfs:label", "Restriction onProperty=locatedIn hasValue=Country 0",
       true)))
    assert(rows.contains(("T1", "rdfs:subClassOf", r, false)))
    // NT rendering goldens for the restriction encoding
    val B = "http://graft.example.org/resource/"
    val O = "http://graft.example.org/ontology/"
    val lines = TripleEmit.toNtLines(t).as[String].collect().toSet
    assert(lines.contains(s"<${B}T1> <${O}subClassOf> " +
      s"<${B}RestrictionHasValue_locatedIn_Country_0> ."))
    assert(lines.contains(s"<${B}RestrictionHasValue_locatedIn_Country_0> " +
      s"<${O}hasValue> <${B}Country_0> ."))
    assert(lines.contains(s"<${B}RestrictionHasValue_locatedIn_Country_0> " +
      s"<${O}label> " +
      "\"Restriction onProperty=locatedIn hasValue=Country 0\"@en ."))
    // the onProperty OBJECT must be the SAME IRI data triples use as
    // predicate — <O/locatedIn>, not a <B/clg:locatedIn> resource
    assert(lines.contains(s"<${B}RestrictionHasValue_locatedIn_Country_0> " +
      s"<${O}onProperty> <${O}locatedIn> ."))
  }

  test("property declarations attach to the predicate IRI, not a resource") {
    val B = "http://graft.example.org/resource/"
    val O = "http://graft.example.org/ontology/"
    val decl = TripleEmit.ontologyPredicateTriples(
      Seq("clg:locatedIn").toDF("pred"))
    val declLines = TripleEmit.toNtLines(decl).as[String].collect().toSet
    assert(declLines ==
      Set(s"<${O}locatedIn> <${O}type> <${B}owl:ObjectProperty> ."))
    val maps = TripleEmit.mappingTriples(
      Seq.empty[(String, String)].toDF("tpe", "ext"),
      Seq(("clg:locatedIn", "dbo:location")).toDF("pred", "ext"),
      Seq.empty[(String, String)].toDF("ent", "ext"))
    val mapLines = TripleEmit.toNtLines(maps).as[String].collect().toSet
    // subject = OUR property (predicate IRI); object = the EXTERNAL name,
    // which stays an opaque resource in this engine's namespace
    assert(mapLines ==
      Set(s"<${O}locatedIn> <${O}equivalentProperty> <${B}dbo:location> ."))
  }

  test("mapping and metadata triples take their documented shapes") {
    val maps = TripleEmit.mappingTriples(
      Seq(("A", "ext:A")).toDF("tpe", "ext"),
      Seq(("clg:p", "ext:p")).toDF("pred", "ext"),
      Seq(("e1", "ext:e1")).toDF("ent", "ext"))
      .as[(String, String, String, Boolean)].collect().toSet
    assert(maps == Set(
      ("A", "rdfs:subClassOf", "ext:A", false),
      ("clg:p", "owl:equivalentProperty", "ext:p", false),
      ("e1", "owl:sameAs", "ext:e1", false)))
    val meta = TripleEmit.metadataTriples(spark, 10, 3, 2)
      .as[(String, String, String, Boolean)].collect()
    assert(meta.length == 6)
    assert(meta.count(_._1 == "void:graft") == 6)
    assert(meta.contains(("void:graft", "void:entities", "10", true)))
    assert(meta.contains(("void:graft", "void:classes", "3", true)))
    assert(meta.contains(("void:graft", "void:properties", "2", true)))
  }

  test("A9 tag gate in the pipeline: invalid-tag subject loses ONLY its type") {
    // Linked fixture mentions are TITLE-shaped, so TITLE is each type's
    // only valid tag; the planted ALLCAPS item is NIL in a type-mined
    // listing → its (ent, Scientist) assertion must be gated out while its
    // label and provenance triples survive (the gate is assertion-level,
    // extract.py:158-162 — not a subject drop). A TITLE-shaped NIL
    // neighbor in the same listing keeps its mined type (positive control).
    val world = graft.testkit.CorpusGen.default
    val mark = "XYZ ROCKET QQ"
    val pages = world.pages.map { p =>
      if (p.url == "https://example.org/list-of-scientists-of-country-0") {
        val body2 = p.text.replace("== See also ==",
          s"* [[$mark]] — anomalous entry.\n== See also ==")
        p.copy(html = world.htmlFor(body2), text = body2)
      } else p
    }
    val outDir = SparkSuite.tempDir("graft-taggate")
    val triples = Pipeline.run(spark, pages.toDS().toDF(),
                               world.seeds(spark), outDir)
    val marked = triples
      .filter(col("pred") === "rdfs:label" && col("obj") === mark)
      .select("subj").as[String].collect()
    assert(marked.length == 1, s"planted label triple missing: $marked")
    assert(triples.filter(col("subj") === marked.head &&
             col("pred") === "rdf:type").count() == 0,
           "ALLCAPS subject must not receive a gated type assertion")
    assert(triples.filter(col("subj") === marked.head &&
             col("pred") === "prov:wasDerivedFrom").count() >= 1)
    val control = triples
      .filter(col("pred") === "rdfs:label" &&
              col("obj") === world.unknownLabel("Scientist", 0, 0))
      .select("subj").as[String].collect()
    assert(control.length == 1)
    assert(triples.filter(col("subj") === control.head &&
             col("pred") === "rdf:type" && col("obj") === "Scientist")
           .count() == 1, "TITLE-shaped NIL neighbor must keep its type")
    // the validity table itself is checkpointed and TITLE-only per type
    val valid = spark.read.parquet(s"$outDir/valid_tags")
      .as[(String, String)].collect().toSet
    assert(valid.contains(("Scientist", "TITLE")) &&
           !valid.exists(_._2 == "ALLCAPS"), s"valid: $valid")
  }

  test("pipeline emits the ontology flavors (axiom fires on the planted type)") {
    val world = graft.testkit.CorpusGen.default
    val outDir = SparkSuite.tempDir("graft-onto")
    val triples = Pipeline.run(spark, world.pages.toDS().toDF(),
                               world.seeds(spark), outDir)
    // the planted axiom (Comet, locatedIn, Country 0) and ONLY it
    val axioms = spark.read.parquet(s"$outDir/axioms")
      .as[(String, String, String)].collect().toSet
    assert(axioms == Set(("Comet", "clg:locatedIn", "Country 0")))
    // restriction subClassOf present in the triple table
    assert(triples.filter(col("subj") === "Comet" &&
      col("pred") === "rdfs:subClassOf" &&
      col("obj") === "RestrictionHasValue_locatedIn_Country 0").count() == 1)
    // class hierarchy queryable straight off the KG
    assert(triples.filter(col("pred") === "rdfs:subClassOf" &&
      col("obj") === "Person").count() == 2) // Scientist, Artist
    // metadata stage: the void row counts are self-consistent
    val meta = spark.read.parquet(s"$outDir/ontology_meta")
      .as[(String, String, String, Boolean)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(meta("void:classes") == "11") // 10 non-root + Thing
    assert(meta("void:properties") == "1")
  }
}
