package graft

import graft.emit.ClusterMetrics

class ClusterMetricsSpec extends SparkSuite {

  private def mk(pred: Seq[Int], gold: Seq[Int]) =
    pred.indices.map(i => (s"m$i", s"p${pred(i)}", s"g${gold(i)}"))

  test("perfect clustering scores 1.0 on all metrics") {
    val s = ClusterMetrics.evaluate(
      mk(Seq(0, 0, 1, 1, 2), Seq(0, 0, 1, 1, 2)))
    assert(s.purity == 1.0 && math.abs(s.nmi - 1.0) < 1e-12 && s.ari == 1.0)
  }

  test("label permutation does not matter") {
    val s = ClusterMetrics.evaluate(
      mk(Seq(2, 2, 0, 0, 1), Seq(0, 0, 1, 1, 2)))
    assert(s.purity == 1.0 && math.abs(s.nmi - 1.0) < 1e-12 &&
           math.abs(s.ari - 1.0) < 1e-12)
  }

  test("single-cluster prediction vs split gold: known values") {
    // pred: all together; gold: two clusters of 2
    val s = ClusterMetrics.evaluate(mk(Seq(0, 0, 0, 0), Seq(0, 0, 1, 1)))
    assert(s.purity == 0.5)
    assert(s.nmi == 0.0)  // H(pred)=0 → NMI defined as 0
    assert(s.ari == 0.0)  // expected == observed under independence
  }

  test("hand-computed ARI on a mixed case") {
    // pred {a,b},{c,d,e}; gold {a,b,c},{d,e}
    val assign = Seq(
      ("a", "p0", "g0"), ("b", "p0", "g0"),
      ("c", "p1", "g0"), ("d", "p1", "g1"), ("e", "p1", "g1"))
    val s = ClusterMetrics.evaluate(assign)
    // pairs: sumIj = C(2,2)+C(1,2)+C(2,2) = 1+0+1 = 2; sumA = 1+3 = 4;
    // sumB = 3+1 = 4; C(5,2)=10; exp = 1.6; max = 4 → ari = 0.4/2.4
    assert(math.abs(s.ari - 0.4 / 2.4) < 1e-12)
    assert(s.purity == 0.8) // (2 + 2)/5
  }
}
