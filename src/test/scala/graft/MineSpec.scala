package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.ZeroPaddedMedian
import graft.mine.{Cat2Ax, Hearst}

class MineSpec extends SparkSuite {
  import spark.implicits._

  test("zero-padded median: hand-computed goldens") {
    // observed [0.8, 0.6] in a set of 4 → padded [0,0,0.6,0.8] → (0+0.6)/2
    assert(ZeroPaddedMedian.paddedMedian(List(0.8, 0.6), 4) == 0.3)
    // set of 3, observed [0.9] → [0,0,0.9] → 0
    assert(ZeroPaddedMedian.paddedMedian(List(0.9), 3) == 0.0)
    // fully observed odd → plain median
    assert(ZeroPaddedMedian.paddedMedian(List(0.1, 0.9, 0.5), 3) == 0.5)
    // empty group
    assert(ZeroPaddedMedian.paddedMedian(Nil, 0) == 0.0)
  }

  test("zero-padded median: equals brute force (ScalaCheck)") {
    val gen = for {
      obs <- Gen.listOfN(5, Gen.choose(0.0, 1.0))
      k <- Gen.choose(0, 5)
      pad <- Gen.choose(0L, 4L)
    } yield (obs.take(k), k + pad)
    val prop = Prop.forAll(gen) { case (obs, n) =>
      val padded = (obs ++ List.fill((n - obs.size).toInt)(0.0)).sorted
      val brute =
        if (n == 0) 0.0
        else if (n % 2 == 1) padded((n.toInt - 1) / 2)
        else (padded(n.toInt / 2 - 1) + padded(n.toInt / 2)) / 2.0
      math.abs(ZeroPaddedMedian.paddedMedian(obs, n) - brute) < 1e-12
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("zero-padded median aggregator distributes correctly") {
    val rows = Seq(("s1", 0.8, 4L), ("s1", 0.6, 4L), ("s2", 0.5, 2L))
      .toDF("set_id", "freq", "set_size").repartition(4)
    val got = rows.groupBy("set_id")
      .agg(ZeroPaddedMedian.column($"freq", $"set_size").as("m"))
      .as[(String, Double)].collect().toMap
    assert(got("s1") == 0.3 && got("s2") == 0.25) // [0,0.5] → 0.25
  }

  test("Cat2Ax mines the argmax-median axiom with zero padding") {
    // set S: cats c1..c3 (size 3). Type T seen in c1 (0.9), c2 (0.8),
    // absent in c3 → padded median 0.8. Type U seen only in c1 (1.0) →
    // padded median 0.0 (the over-confidence case padding must kill).
    val catSets = Seq(("S", "c1"), ("S", "c2"), ("S", "c3"))
      .toDF("set_id", "cat_id")
    val freqs = Seq(("c1", "T", 0.9), ("c2", "T", 0.8), ("c1", "U", 1.0))
      .toDF("cat_id", "value", "freq")
    val axioms = Cat2Ax.mineAxioms(catSets, freqs, minMedian = 0.5)
      .as[(String, String, Double, Double)].collect()
    assert(axioms.toSeq == Seq(("S", "T", 0.8, 0.666667)))
  }

  test("Hearst matcher extracts hypernym pairs") {
    val got = Hearst.matchText(
      "Ada Prime is a scientist. Cities such as Berlin grew. " +
      "Paris and other capitals. Animals including cats are cute!")
    assert(got.contains(Hearst.Hypernym("prime", "scientist")))
    assert(got.contains(Hearst.Hypernym("berlin", "cities")))
    assert(got.contains(Hearst.Hypernym("paris", "capitals")))
    assert(got.contains(Hearst.Hypernym("cats", "animals")))
  }

  test("hypernym merge: 2-of-3 vote with per-source thresholds") {
    val wiki = Seq(("a", "b", 12L), ("c", "d", 5L)).toDF("sub", "obj", "cnt")
    val web = Seq(("a", "b", 200L), ("e", "f", 300L)).toDF("sub", "obj", "cnt")
    val ratios = Seq(("e", "f", 0.6), ("a", "b", 0.1))
      .toDF("sub", "obj", "ratio")
    val got = Hearst.mergeSources(wiki, 10, web, 100, ratios, 0.4)
      .as[(String, String, Long)].collect().toSet
    // (a,b): wiki✓(12>=10) + web✓(200>=100) = 2 votes; (e,f): web✓+ratio✓;
    // (c,d): wiki✗(5<10) only
    assert(got == Set(("a", "b", 2L), ("e", "f", 2L)))
  }
}
