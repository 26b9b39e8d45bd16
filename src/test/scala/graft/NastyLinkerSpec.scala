package graft

import graft.canonical.NastyLinker

/** G10: the faithful NastyLinker best-path split — the fixture's expected
  * assignments are hand-computed with the REFERENCE algorithm
  * (multi-source Dijkstra, −log₂ weights, path score 2^(−dist) > 0.75;
  * `greedy_clustering.py:83-102`); the spec asserts our max-product
  * propagation reproduces every decision, plus partition invariance. */
class NastyLinkerSpec extends SparkSuite {
  import spark.implicits._

  // weighted alignment graph:
  //  comp A (2 entities → split):
  //   e:1 —0.9— m:1 —0.9— m:2 —0.5— e:2 ; m:2 —0.8— m:3 —0.6— m:4
  //   best scores: m1 = 0.9 (e1) ; m2 = 0.81 (e1) beats 0.5 (e2) ;
  //   m3 = 0.81*0.8 = 0.648 < 0.75 → NIL ; m4 = 0.389 → NIL (same NIL comp)
  //  comp B (1 entity → pass-through regardless of weak weights):
  //   e:3 —0.1— m:5 —0.1— m:6
  //  comp C (0 entities → one NIL cluster): m:7 —0.9— m:8
  //  comp D (tie → entity id asc): e:4 —0.8— m:9 —0.8— e:5
  private val edges = Seq(
    ("m:1", "e:1", 0.9), ("m:1", "m:2", 0.9), ("m:2", "e:2", 0.5),
    ("m:2", "m:3", 0.8), ("m:3", "m:4", 0.6),
    ("m:5", "e:3", 0.1), ("m:5", "m:6", 0.1),
    ("m:7", "m:8", 0.9),
    ("m:9", "e:4", 0.8), ("m:9", "e:5", 0.8))

  test("best-path split reproduces the reference's decisions") {
    val got = NastyLinker.cluster(edges.toDF("src", "dst", "weight"))
      .as[(String, Option[String], String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("1")._1.contains("1"))
    assert(got("2")._1.contains("1"), "0.81 via m:1 must beat 0.5 direct")
    assert(got("3")._1.isEmpty && got("4")._1.isEmpty,
           "0.648 <= 0.75 -> NIL")
    assert(got("3")._2 == got("4")._2, "m3,m4 share one NIL cluster")
    assert(got("3")._2.startsWith("nil:"))
    // single-entity component: pass-through even at weight 0.1
    assert(got("5")._1.contains("3") && got("6")._1.contains("3"))
    // zero-entity component: one NIL cluster
    assert(got("7")._1.isEmpty && got("7")._2 == got("8")._2)
    assert(got("7")._2 != got("3")._2, "separate NIL components stay separate")
    // tie at 0.8/0.8: deterministic entity-id-asc tie-break
    assert(got("9")._1.contains("4"))
    assert(got.size == 9)
  }

  test("split is partition-invariant") {
    val a = NastyLinker.cluster(
      edges.toDF("src", "dst", "weight").repartition(1))
      .as[(String, Option[String], String)].collect().toSet
    val b = NastyLinker.cluster(
      edges.reverse.toDF("src", "dst", "weight").repartition(7))
      .as[(String, Option[String], String)].collect().toSet
    assert(a == b)
  }

  test("threshold boundary is strict (score must EXCEED 0.75)") {
    // 2-entity component so the split applies: m:1's best path is exactly
    // 0.75 → NOT attached (reference: score > threshold, strict);
    // m:2 at 0.7500001 attaches.
    val df = Seq(("m:1", "e:1", 0.75), ("m:1", "e:2", 0.5),
                 ("m:2", "e:1", 0.7500001))
      .toDF("src", "dst", "weight")
    val got = NastyLinker.cluster(df)
      .as[(String, Option[String], String)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got("1").isEmpty, "score == threshold must stay NIL")
    assert(got("2").contains("1"))
  }

  test("weights above 1 are clamped like the reference's min(score, 1)") {
    val df = Seq(("m:1", "e:1", 5.0), ("m:1", "e:2", 0.9),
                 ("e:1", "e:2", 0.1))
      .toDF("src", "dst", "weight")
    val got = NastyLinker.cluster(df)
      .as[(String, Option[String], String)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got("1").contains("1"), "clamped 1.0 beats 0.9")
  }
}
