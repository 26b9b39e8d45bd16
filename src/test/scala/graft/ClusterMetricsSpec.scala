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

  test("distributed evaluateDf ≡ driver-side evaluate (+ B³ hand check)") {
    import spark.implicits._
    // a deliberately lumpy assignment: 40 items, 5 pred × 3 gold clusters
    val assign = (0 until 40).map(i =>
      (s"m$i", s"p${(i * 7) % 5}", s"g${(i * i) % 3}"))
    val seqScores = ClusterMetrics.evaluate(assign)
    val df = assign.toDF("item", "pred", "gold")
    val row = ClusterMetrics.evaluateDf(df.select("pred", "gold")).head()
    assert(row.getLong(0) == 40)
    assert(math.abs(row.getDouble(1) - seqScores.purity) < 1e-6)
    assert(math.abs(row.getDouble(2) - seqScores.nmi) < 1e-6)
    assert(math.abs(row.getDouble(3) - seqScores.ari) < 1e-6)
    // B³ naive twin: per-item |C∩G|/|C| and /|G|
    val joint = assign.groupBy(a => (a._2, a._3)).view.mapValues(_.size)
    val pred = assign.groupBy(_._2).view.mapValues(_.size)
    val gold = assign.groupBy(_._3).view.mapValues(_.size)
    val bp = assign.map(a => joint((a._2, a._3)).toDouble / pred(a._2))
      .sum / assign.size
    val br = assign.map(a => joint((a._2, a._3)).toDouble / gold(a._3))
      .sum / assign.size
    assert(math.abs(row.getDouble(4) - bp) < 1e-6)
    assert(math.abs(row.getDouble(5) - br) < 1e-6)
    assert(math.abs(row.getDouble(6) - 2 * bp * br / (bp + br)) < 1e-6)
    // partitioning invariance of the distributed path
    val row16 = ClusterMetrics.evaluateDf(
      df.repartition(16).select("pred", "gold")).head()
    assert(row.toSeq == row16.toSeq)
  }

  test("evaluateDf degenerate guards: perfect and single-cluster") {
    import spark.implicits._
    val perfect = Seq(("p0", "g0"), ("p0", "g0"), ("p1", "g1"))
      .toDF("pred", "gold")
    val r = ClusterMetrics.evaluateDf(perfect).head()
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 &&
           r.getDouble(3) == 1.0 && r.getDouble(6) == 1.0)
    // H(pred)=0 → NMI 0 (the when-guard, not 0/0)
    val onePred = Seq(("p0", "g0"), ("p0", "g0"), ("p0", "g1"), ("p0", "g1"))
      .toDF("pred", "gold")
    val r2 = ClusterMetrics.evaluateDf(onePred).head()
    assert(r2.getDouble(2) == 0.0 && r2.getDouble(3) == 0.0)
  }

  test("evaluateDf: NULL keys are ordinary clusters; empty input fails") {
    import spark.implicits._
    // unlabeled items (null gold) must stay in the contingency mass —
    // an equi-join would silently drop the (p0, null) cell from MI/B³
    val withNull = Seq(("p0", Option("g0")), ("p0", None), ("p1", Option("g1")),
                       ("p1", Option("g1")), ("p0", Option("g0")))
    val seqScores = ClusterMetrics.evaluate(
      withNull.zipWithIndex.map { case ((p, g), i) =>
        (s"m$i", p, g.orNull) })
    val row = ClusterMetrics.evaluateDf(
      withNull.toDF("pred", "gold")).head()
    assert(row.getLong(0) == 5)
    assert(math.abs(row.getDouble(1) - seqScores.purity) < 1e-6)
    assert(math.abs(row.getDouble(2) - seqScores.nmi) < 1e-6)
    assert(math.abs(row.getDouble(3) - seqScores.ari) < 1e-6)
    // B³ recall counts the null-gold item against its own 1-item class
    val joint = withNull.groupBy(identity).view.mapValues(_.size)
    val pred = withNull.groupBy(_._1).view.mapValues(_.size)
    val gold = withNull.groupBy(_._2).view.mapValues(_.size)
    val bp = withNull.map(a => joint(a).toDouble / pred(a._1)).sum / 5
    val br = withNull.map(a => joint(a).toDouble / gold(a._2)).sum / 5
    assert(math.abs(row.getDouble(4) - bp) < 1e-6)
    assert(math.abs(row.getDouble(5) - br) < 1e-6)
    intercept[IllegalArgumentException] {
      ClusterMetrics.evaluateDf(
        Seq.empty[(String, String)].toDF("pred", "gold"))
    }
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
