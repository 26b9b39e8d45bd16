package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.emit.EdMetrics
import graft.emit.EdMetrics.{Cluster, PRF}

/** Hand-computed goldens for the reference's ED metric family
  * (evaluation.py:33-55,122-167): Hungarian NIL assignment, MUC, B³, B³+,
  * CEAF-e. Pure driver-side math — no Spark session needed. */
class EdMetricsSpec extends AnyFunSuite {

  private def approx(got: PRF, p: Double, r: Double, f1: Double): Unit = {
    assert(math.abs(got.p - p) < 1e-9, s"p: ${got.p} vs $p")
    assert(math.abs(got.r - r) < 1e-9, s"r: ${got.r} vs $r")
    assert(math.abs(got.f1 - f1) < 1e-9, s"f1: ${got.f1} vs $f1")
  }

  test("hungarian: square, anti-diagonal, rectangular") {
    assert(EdMetrics.hungarian(Array(Array(1.0, 2.0), Array(2.0, 1.0)))
      .toSeq == Seq(0, 1))
    assert(EdMetrics.hungarian(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
      .toSeq == Seq(1, 0))
    assert(EdMetrics.hungarian(Array(Array(5.0, 1.0, 3.0))).toSeq == Seq(1))
    // total cost is optimal, not greedy: greedy row0->col0(1) forces
    // row1->col1(10); optimal is 2+1
    assert(EdMetrics.hungarian(Array(Array(1.0, 2.0), Array(1.0, 10.0)))
      .toSeq == Seq(1, 0))
  }

  test("MUC / B3 / CEAF-e on the textbook split (Vilain/Luo)") {
    // gold: one cluster {m1..m4}; pred: {m1,m2} {m3,m4}
    val clusters = Seq(Cluster(Set("m1", "m2"), None),
                       Cluster(Set("m3", "m4"), None))
    val gold = Map("m1" -> "E1", "m2" -> "E1", "m3" -> "E1", "m4" -> "E1")
    approx(EdMetrics.muc(clusters, gold), 1.0, 2.0 / 3, 0.8)
    approx(EdMetrics.bCubed(clusters, gold), 1.0, 0.5, 2.0 / 3)
    // CEAF-e: best single match phi4({m1,m2},{m1..m4}) = 2*2/(2+4) = 2/3
    approx(EdMetrics.ceafE(clusters, gold), 1.0 / 3, 2.0 / 3, 4.0 / 9)
  }

  test("Hungarian NIL assignment maps NIL clusters to unknown entities") {
    val clusters = Seq(
      Cluster(Set("m1", "m2"), None), // -> U1 (2 hits)
      Cluster(Set("m3"), None),       // -> U2 (1 hit)
      Cluster(Set("m4"), Some("K")))  // known, passes through
    val gold = Map("m1" -> "U1", "m2" -> "U1", "m3" -> "U2", "m4" -> "K")
    val assigned = EdMetrics.assignNilClusters(clusters, gold, Set("K"))
    val byMention = assigned.flatMap(c => c.mentions.map(_ -> c.ent)).toMap
    assert(byMention("m1").contains("U1") && byMention("m2").contains("U1"))
    assert(byMention("m3").contains("U2"))
    assert(byMention("m4").contains("K"))
    // perfect clustering + correct assignment -> every metric is 1.0
    val all = EdMetrics.evaluate(clusters, gold, Set("K"))
    Seq("MUC", "B3", "B3+", "CEAF").foreach { k =>
      approx(all(k), 1.0, 1.0, 1.0)
    }
  }

  test("B3+ zeroes mentions whose cluster entity is wrong; B3 does not") {
    val clusters = Seq(Cluster(Set("m1", "m2"), Some("A")))
    val gold = Map("m1" -> "B", "m2" -> "B")
    approx(EdMetrics.bCubed(clusters, gold), 1.0, 1.0, 1.0)
    approx(EdMetrics.bCubed(clusters, gold, plusEnt = true), 0.0, 0.0, 0.0)
  }

  test("zero-hit NIL assignments are discarded (evaluation.py:51-53)") {
    // the only unknown entity U1 belongs to cluster A's mentions; cluster B
    // has no unknown-gold mention, so it must stay NIL even though a
    // padded column is available
    val clusters = Seq(Cluster(Set("m1"), None), Cluster(Set("m2"), None))
    val gold = Map("m1" -> "U1", "m2" -> "K")
    val assigned = EdMetrics.assignNilClusters(clusters, gold, Set("K"))
    val byMention = assigned.flatMap(c => c.mentions.map(_ -> c.ent)).toMap
    assert(byMention("m1").contains("U1"))
    assert(byMention("m2").isEmpty)
  }

  test("mentions without a gold mapping are ignored (evaluation.py:71-73)") {
    val clusters = Seq(Cluster(Set("m1", "mX"), Some("A")))
    val gold = Map("m1" -> "A")
    approx(EdMetrics.bCubed(clusters, gold, plusEnt = true), 1.0, 1.0, 1.0)
    approx(EdMetrics.muc(clusters, gold), 0.0, 0.0, 0.0) // no links left
  }
}
