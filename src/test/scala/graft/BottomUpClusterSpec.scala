package graft

import graft.canonical.BottomUpCluster

/** Bottom-up union-find clustering (G11 + W5) against hand-traced
  * executions of the reference fold
  * (`bottomup_clustering.py:33-83`): edge order (first endpoint desc, ME
  * before MM), the both-entities-set merge skip, entity inheritance through
  * merges, the late-ME no-overwrite rule, and the global same-entity
  * collapse. */
class BottomUpClusterSpec extends SparkSuite {
  import spark.implicits._

  private def run(me: Seq[(String, String, Double)],
                  mm: Seq[(String, String, Double)],
                  mmThr: Double = 0.5, meThr: Double = 0.45) =
    BottomUpCluster.cluster(
      me.toDF("mention_id", "ent", "score"),
      mm.toDF("m1", "m2", "score"), mmThr, meThr)
      .as[(String, String, String)].collect()
      .map(r => r._1 -> ((Option(r._2), r._3))).toMap

  test("both-entities-set MM edges are skipped; sub-threshold ME leaves NIL") {
    // order: ME(mB,e2) [u=mB] > ME(mA,e1), MM(mA,mB) [u=mA].
    // Fold: mB→e2; mA→e1; MM skip (both set). mC: 0.4 <= thr → NIL singleton.
    // Decoy (mA,e9,.85) loses the argmax to (mA,e1,.9).
    val out = run(
      me = Seq(("mA", "e1", 0.9), ("mA", "e9", 0.85),
               ("mB", "e2", 0.8), ("mC", "e1", 0.4)),
      mm = Seq(("mA", "mB", 0.9)))
    assert(out === Map(
      "mA" -> ((Some("e1"), "mA")),
      "mB" -> ((Some("e2"), "mB")),
      "mC" -> ((None, "mC"))))
  }

  test("entity flows through a merge and blocks a later ME assignment; " +
       "same-entity clusters collapse globally") {
    // order: ME(m5,e1) > ME(m3,e1), MM(m3,m2) > ME(m2,e2).
    // Fold: m5→e1; m3→e1; merge {m2,m3} inherits e1; ME(m2,e2) skipped
    // (cluster already has e1). Collapse: e1 clusters {m5},{m2,m3} → m2.
    val out = run(
      me = Seq(("m3", "e1", 0.9), ("m2", "e2", 0.9), ("m5", "e1", 0.9)),
      mm = Seq(("m3", "m2", 0.9)))
    assert(out === Map(
      "m2" -> ((Some("e1"), "m2")),
      "m3" -> ((Some("e1"), "m2")),
      "m5" -> ((Some("e1"), "m2"))))
  }

  test("edge orientation changes the fold order and the outcome (W5)") {
    // same graph, MM edge stored as (m2,m3): now BOTH MEs fire before the
    // MM edge (u=m2 sorts after m3's ME), so the merge is skipped.
    val out = run(
      me = Seq(("m3", "e1", 0.9), ("m2", "e2", 0.9), ("m5", "e1", 0.9)),
      mm = Seq(("m2", "m3", 0.9)))
    assert(out === Map(
      "m2" -> ((Some("e2"), "m2")),
      "m3" -> ((Some("e1"), "m3")),
      "m5" -> ((Some("e1"), "m3"))))
  }

  test("entity-free chains merge fully; thresholds prune edges") {
    val out = run(
      me = Seq(("m1", "e1", 0.1)), // below meThr → domain only
      mm = Seq(("m2", "m1", 0.9), ("m3", "m2", 0.9),
               ("m3", "m4", 0.2))) // below mmThr → m4 stays singleton
    assert(out === Map(
      "m1" -> ((None, "m1")), "m2" -> ((None, "m1")),
      "m3" -> ((None, "m1")), "m4" -> ((None, "m4"))))
  }

  test("ME argmax tie-breaks to the smaller entity id") {
    val out = run(
      me = Seq(("m1", "e2", 0.9), ("m1", "e1", 0.9)), mm = Nil)
    assert(out("m1") === ((Some("e1"), "m1")))
  }

  test("result is invariant to input partitioning") {
    val me = Seq(("m3", "e1", 0.9), ("m2", "e2", 0.9), ("m5", "e1", 0.9))
    val mm = Seq(("m3", "m2", 0.9), ("m7", "m6", 0.8), ("m8", "m7", 0.8))
    val a = BottomUpCluster.cluster(
      me.toDF("mention_id", "ent", "score").repartition(1),
      mm.toDF("m1", "m2", "score").repartition(1), 0.5, 0.45)
      .as[(String, String, String)].collect().toSet
    val b = BottomUpCluster.cluster(
      me.toDF("mention_id", "ent", "score").repartition(7),
      mm.toDF("m1", "m2", "score").repartition(5), 0.5, 0.45)
      .as[(String, String, String)].collect().toSet
    assert(a === b)
  }
}
