package graft

import graft.taxonomy.GraphOps

class GraphOpsSpec extends SparkSuite {

  test("topoOrder: parents first, deterministic tie-break") {
    val edges = Seq(("root", "b"), ("root", "a"), ("a", "c"), ("b", "c"))
    assert(GraphOps.topoOrder(edges) == Seq("root", "a", "b", "c"))
  }

  test("removeCycles drops the deeper→shallower edge") {
    // root→a→b→c plus back-edge c→a
    val edges = Seq(("root", "a"), ("a", "b"), ("b", "c"), ("c", "a"))
    val fixed = GraphOps.removeCycles(edges)
    assert(!fixed.contains(("c", "a")))
    assert(fixed.toSet == Set(("root", "a"), ("a", "b"), ("b", "c")))
    // already-acyclic input is untouched
    assert(GraphOps.removeCycles(fixed).toSet == fixed.toSet)
  }

  test("transitiveReduction removes shortcut edges") {
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"))
    assert(GraphOps.transitiveReduction(edges).toSet ==
      Set(("a", "b"), ("b", "c")))
  }

  test("mergeByLabel collapses synonyms and rewires edges") {
    val edges = Seq(("Thing", "Movies"), ("Thing", "Films"),
                    ("Movies", "Comedies"), ("Films", "Dramas"))
    val canon = Map("Movies" -> "film", "Films" -> "film",
                    "Thing" -> "thing", "Comedies" -> "comedy",
                    "Dramas" -> "drama")
    val (merged, mapping) = GraphOps.mergeByLabel(edges, canon)
    assert(mapping == Map("Movies" -> "Films"))
    assert(merged.toSet == Set(("Thing", "Films"),
      ("Films", "Comedies"), ("Films", "Dramas")))
  }

  test("appendUnconnected attaches orphans by head key, else root") {
    val edges = Seq(("root", "French cities"))
    val all = Seq("root", "French cities", "German cities", "Oddball")
    val head = (s: String) => s.split(" ").last
    val got = GraphOps.appendUnconnected(edges, all, "root", head)
    assert(got.contains(("French cities", "German cities")))
    assert(got.contains(("root", "Oddball")))
  }

  test("filterEdgesByHypernymy keeps hypernym-supported edges") {
    val edges = Seq(("Animals", "Cats"), ("Animals", "Tables"))
    val hyper = Set(("cats", "animals"))
    val got = GraphOps.filterEdgesByHypernymy(
      edges, _.toLowerCase, (c, p) => hyper((c, p)))
    assert(got == Seq(("Animals", "Cats")))
  }
}
