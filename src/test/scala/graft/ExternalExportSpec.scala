package graft

import org.apache.spark.sql.functions._
import graft.emit.{ExternalKbExport => E, TypeDistribution}

/** External-KB export flavors (`serialize.py:240-302`) and the sunburst
  * type distribution (`serialize.py:306-344`) — the last serialization
  * artifacts of the reference's run_serialization. */
class ExternalExportSpec extends SparkSuite {
  import spark.implicits._

  private val prefix = "ext:"

  test("new instances: only new: entities materialize, with type + label") {
    val labels = Seq(("ent:A", "Alpha"), ("new:b", "Beta"))
      .toDF("ent", "label")
    val got = E.newInstanceTriples(labels, prefix)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("ext:b", "rdf:type", "owl:NamedIndividual", false),
      ("ext:b", "rdfs:label", "Beta", true)))
  }

  test("ext types: map + close externally; linked subtract seed knowledge") {
    val types = Seq(("ent:A", "T1"), ("ent:A", "T2"), ("new:b", "T1"))
      .toDF("ent", "tpe")
    val typeMap = Seq(("T1", "X1"), ("T2", "X2")).toDF("tpe", "ext")
    val extClosure = Seq(("X1", "X1"), ("X1", "XR"), ("X2", "X2"),
                         ("XR", "XR")).toDF("node", "anc")
    val seedExt = Seq(("ent:A", "XR")).toDF("ent", "ext")
    val got = E.extTypeTriples(types, typeMap, extClosure, seedExt, prefix)
      .as[(String, String, String, Boolean)].collect().toSet
    // ent:A reaches {X1, XR, X2}; XR already known to the seed → subtracted.
    // new:b reaches {X1, XR}, keeps both, re-namespaced.
    assert(got == Set(
      ("ent:A", "rdf:type", "X1", false),
      ("ent:A", "rdf:type", "X2", false),
      ("ext:b", "rdf:type", "X1", false),
      ("ext:b", "rdf:type", "XR", false)))
  }

  test("local direct + transitive-only type flavors split cleanly") {
    val direct = Seq(("ent:A", "T1"), ("new:b", "T1")).toDF("ent", "tpe")
    val all = Seq(("ent:A", "T1"), ("ent:A", "TP"), ("new:b", "T1"),
                  ("new:b", "TP")).toDF("ent", "tpe")
    val d = E.localTypeTriples(direct)
      .as[(String, String, String, Boolean)].collect().toSet
    val t = E.localTransitiveTypeTriples(direct, all)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(d == Set(("ent:A", "rdf:type", "T1", false)))
    assert(t == Set(("ent:A", "rdf:type", "TP", false)))
  }

  test("ext relations: predicate map, re-namespacing, seed-known skip") {
    val rels = Seq(
      ("ent:A", "clg:locatedIn", "ent:N1"),  // seed-known → skipped
      ("ent:A", "clg:locatedIn", "new:x"),   // new object → kept
      ("new:b", "clg:locatedIn", "ent:N1"),  // new subject → kept
      ("ent:A", "clg:other", "ent:N1"))      // unmapped predicate → dropped
      .toDF("ent", "pred", "obj")
    val predMap = Seq(("clg:locatedIn", "dbo:location")).toDF("pred", "ext")
    val seed = Seq(("ent:A", "dbo:location", "ent:N1"))
      .toDF("sub", "pred", "obj")
    val got = E.extRelationTriples(rels, predMap, seed, prefix)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(got == Set(
      ("ent:A", "dbo:location", "ext:x", false),
      ("ext:b", "dbo:location", "ent:N1", false)))
  }

  test("exportAll unions the five flavors duplicate-free") {
    val labels = Seq(("ent:A", "Alpha"), ("new:b", "Beta"))
      .toDF("ent", "label")
    val direct = Seq(("ent:A", "T1"), ("new:b", "T1")).toDF("ent", "tpe")
    val all = direct.unionByName(
      Seq(("ent:A", "TP"), ("new:b", "TP")).toDF("ent", "tpe"))
    val rels = Seq(("ent:A", "clg:locatedIn", "new:x"))
      .toDF("ent", "pred", "obj")
    val typeMap = Seq(("T1", "X1"), ("TP", "XP")).toDF("tpe", "ext")
    val extClosure = Seq(("X1", "X1"), ("XP", "XP")).toDF("node", "anc")
    val seedExt = Seq.empty[(String, String)].toDF("ent", "ext")
    val predMap = Seq(("clg:locatedIn", "dbo:location")).toDF("pred", "ext")
    val seedRel = Seq.empty[(String, String, String)]
      .toDF("sub", "pred", "obj")
    val out = E.exportAll(labels, direct, all, rels, typeMap, extClosure,
                          seedExt, predMap, seedRel, prefix)
    assert(out.count() == out.distinct().count())
    // 2 (new instance) + 4 (ext types) + 1 (local direct, linked only)
    // + 1 (local transitive) + 1 (relation)
    assert(out.count() == 9)
  }

  test("chosen types follow the deterministic hash rule") {
    val entTypes = Seq(("e1", "B"), ("e1", "A"), ("e1", "C"), ("e2", "Z"))
      .toDF("ent", "tpe")
    val got = TypeDistribution.chosenTypes(entTypes)
      .as[(String, String)].collect().toMap
    // single-type entity: trivially its type
    assert(got("e2") == "Z")
    // multi-type: the xxhash64(ent)-indexed element of the SORTED list
    val idx = spark.range(1)
      .select(pmod(xxhash64(lit("e1")), lit(3)).cast("int"))
      .as[Int].head()
    assert(got("e1") == Seq("A", "B", "C")(idx))
    // exactly one pick per entity
    assert(TypeDistribution.chosenTypes(entTypes).count() == 2)
  }

  test("sunburst: counts roll up, thresholds prune, remainder appears") {
    // A1(6) A2(3) A3(1) under A; B(1) under R; single-type entities make
    // the random-choice substitution trivial and the counts exact
    val entTypes = ((0 until 6).map(i => (s"ea$i", "A1")) ++
      (0 until 3).map(i => (s"eb$i", "A2")) ++ Seq(("ec", "A3"), ("ed", "B")))
      .toDF("ent", "tpe")
    val edges = Seq(("A1", "A"), ("A2", "A"), ("A3", "A"), ("A", "R"),
                    ("B", "R")).toDF("child", "parent")
    val got = TypeDistribution.sunburst(entTypes, edges, "R")
    // A=10, R=11, B=1. Level-1 threshold 0.1: A3 at 1/10 is NOT > 0.1 →
    // folded into "-other-". Leaf weights: 10*(6/10)=6, 3, 1; B=1.
    val expected =
      """{"name": "R", "children": [""" +
        """{"name": "A", "children": [""" +
          """{"name": "A1", "value": 6}, """ +
          """{"name": "A2", "value": 3}, """ +
          """{"name": "-other-", "value": 1}]}, """ +
        """{"name": "B", "value": 1}]}"""
    assert(got == expected)
  }

  test("sunburst level-0 remainder is named '...'") {
    // 999 entities on A, 1 on B: B at 1/1000 is NOT > 0.005 → level-0 "..."
    val entTypes = spark.range(999)
      .select(concat(lit("e"), col("id")).as("ent"), lit("A").as("tpe"))
      .unionByName(Seq(("x", "B")).toDF("ent", "tpe"))
    val edges = Seq(("A", "R"), ("B", "R")).toDF("child", "parent")
    val got = TypeDistribution.sunburst(entTypes, edges, "R")
    assert(got ==
      """{"name": "R", "children": [{"name": "A", "value": 999}, """ +
      """{"name": "...", "value": 1}]}""")
  }
}
