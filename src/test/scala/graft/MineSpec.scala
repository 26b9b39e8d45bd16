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
    // the two reference patterns the matcher previously lacked
    // (hearst_matcher.py:27-34), and the non-reference "such NP as NP"
    // form that must NOT match (the reference has no such pattern)
    val extra = Hearst.matchText(
      "Composers particularly Bach endure. Mammals other than whales walk. " +
      "Such cities as Paris shine.")
    assert(extra.contains(Hearst.Hypernym("bach", "composers")))
    assert(extra.contains(Hearst.Hypernym("whales", "mammals")))
    assert(!extra.exists(h => h.obj == "cities" || h.sub == "paris"))
  }

  test("fused sentence cleanup == the regex chain (adversarial)") {
    // the reference chain the fused scan replaced, verbatim: split on
    // [.!?], map non-[a-z0-9 ] to spaces, squash 2+ spaces, trim; empty
    // cleaned sentences dropped (they match no pattern either way)
    val SentenceEnd = java.util.regex.Pattern.compile("[.!?]")
    val NonToken = java.util.regex.Pattern.compile("[^a-z0-9 ]")
    val Spaces = java.util.regex.Pattern.compile(" {2,}")
    def refSentences(text: String): Seq[String] =
      SentenceEnd.split(text.toLowerCase).toSeq.map { sentence =>
        Spaces.matcher(
          NonToken.matcher(sentence).replaceAll(" ")).replaceAll(" ").trim
      }.filter(_.nonEmpty)
    val edges = Seq(
      "", ".", "...", "a.b", "a..b", ".x", "x.", "A city is a PLACE!",
      "  lots   of,, punct?? here !", "Umeå Ä is a töwn.",
      "tabs\tand\nnewlines are tokens? no; they clean.",
      "a city, such as berlin. such cities as: paris!")
    edges.foreach { s =>
      assert(Hearst.cleanedSentences(s) == refSentences(s), s"input=$s")
    }
    val htmlish: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      3 -> Gen.oneOf(" ", ".", "!", "?", ",", ";", "-", "\n", "\t"),
      1 -> Gen.oneOf("is a", "such as", "é", "Ü", "5"))).map(_.mkString)
    val prop = Prop.forAll(htmlish) { s =>
      Hearst.cleanedSentences(s) == refSentences(s)
    }
    assert(SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(500), prop).passed)
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

  test("pattern probe: greedy trie walk reproduces _detect_patterns") {
    import graft.mine.PatternProbe
    // front dict with a short pattern and a longer diverging one
    val t = PatternProbe.buildTrie(Seq(
      (Seq("british"), Nil),
      (Seq("british", "rock", "bands"), Nil)))
    // greedy descent past 'british rock' then failure WITHOUT a HIT or
    // REVERSE at that node -> None (the reference does NOT backtrack to
    // the shorter 'british' pattern)
    assert(PatternProbe.detect(t, Seq("british", "rock", "stars")).isEmpty)
    // failing at the 'british' node finds its REVERSE->HIT
    assert(PatternProbe.detect(t, Seq("british", "pop", "stars")) ==
      Some((Seq("british"), Nil, 1, 0)))
    // the longer path matches normally
    assert(PatternProbe.detect(
      t, Seq("british", "rock", "bands", "x")) ==
      Some((Seq("british", "rock", "bands"), Nil, 3, 0)))
    // label == pattern consumes every word -> no match (no text diff left)
    assert(PatternProbe.detect(t, Seq("british")).isEmpty)
    // enclosing: front prefix + back suffix via the REVERSE recursion
    val e = PatternProbe.buildTrie(Seq(
      (Seq("best"), Seq("of", "europe"))))
    assert(PatternProbe.detect(
      e, Seq("best", "lakes", "of", "europe")) ==
      Some((Seq("best"), Seq("of", "europe"), 1, 2)))
    assert(PatternProbe.detect(e, Seq("best", "lakes")).isEmpty)
  }

  test("pattern probe applies mined axioms beyond the originating sets") {
    import graft.mine.{CategorySets, PatternProbe}
    // sets discovered from one parent's children ...
    val parentChild = Seq(
      ("Wines", "c1", "Wines of France"),
      ("Wines", "c2", "Wines of Spain"),
      ("Wines", "c3", "Wines of Chile"),
      ("Wines", "c4", "Sparkling producers")).toDF("parent", "cat_id", "label")
    val sets = CategorySets.categorySets(parentChild)
    val setIds = sets.select("set_id", "front_pattern", "back_pattern")
      .distinct().collect()
    assert(setIds.exists(_.getString(1) == "Wines of"), setIds.mkString(","))
    // ... axioms mined for those sets (median over member freqs)
    val wineSet = setIds.find(_.getString(1) == "Wines of").get.getString(0)
    val memberFreqs = Seq(
      ("c1", "type:Wine", 0.9), ("c2", "type:Wine", 0.8),
      ("c3", "type:Wine", 0.7)).toDF("cat_id", "value", "freq")
    val axioms = Cat2Ax.mineAxioms(sets, memberFreqs)
    assert(axioms.filter(org.apache.spark.sql.functions.col("set_id") === wineSet).count() == 1)
    // ... reach a NEW category never seen during set construction
    val newCats = Seq(("n1", "Wines of Portugal"), ("n2", "Beers of Belgium"))
      .toDF("cat_id", "label")
    val applied = PatternProbe.axiomsForNewCats(sets, axioms, newCats)
      .select("cat_id", "value", "text_diff")
      .as[(String, String, String)].collect().toSet
    assert(applied.contains(("n1", "type:Wine", "Portugal")), applied)
    assert(!applied.exists(_._1 == "n2"))
  }
}
