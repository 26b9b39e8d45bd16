package graft

import graft.taxonomy.RuleMining
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Exact algebra of the pattern statistics (SURVEY.md §7.5 #4: micro_std is
  * mean ABSOLUTE deviation with zero-filled pages, not stddev) + listing
  * rule thresholds. */
class RuleMiningSpec extends SparkSuite {
  import spark.implicits._

  test("patternStats matches the hand-computed reference algebra") {
    // pattern P1: pages (hits,total) = (3,4),(0,2),(1,1)
    val perPage = Seq(
      ("P1", "u1", 3L, 4L), ("P1", "u2", 0L, 2L), ("P1", "u3", 1L, 1L),
      ("P2", "u1", 2L, 2L))
      .toDF("pattern", "url", "hits", "total")
    val got = RuleMining.patternStats(perPage)
      .as[(String, Double, Double, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    val (_, micro, macroMean, std, n) = got("P1")
    assert(micro == 4.0 / 7.0)                    // sum(hits)/sum(total)
    assert(macroMean == (0.75 + 0.0 + 1.0) / 3)   // mean of per-page conf
    val m = 4.0 / 7.0
    val expStd = (math.abs(0.75 - m) + math.abs(0.0 - m) + math.abs(1.0 - m)) / 3
    assert(math.abs(std - expStd) < 1e-12)        // mean abs deviation
    assert(n == 3)
    assert(got("P2")._2 == 1.0 && got("P2")._4 == 0.0)
  }

  test("patternStats is permutation-invariant (ScalaCheck)") {
    val gen = Gen.listOfN(6, Gen.zip(Gen.choose(0L, 5L), Gen.choose(1L, 6L)))
    def stats(rs: Seq[(String, String, Long, Long)]) =
      RuleMining.patternStats(rs.toDF("pattern", "url", "hits", "total"))
        .as[(String, Double, Double, Double, Long)].collect().head
    val prop = Prop.forAll(gen) { pairs =>
      val rows = pairs.zipWithIndex.map { case ((h, t), i) =>
        ("P", s"u$i", math.min(h, t), t)
      }
      val a = stats(rows)
      val b = stats(rows.reverse)
      math.abs(a._2 - b._2) < 1e-12 && math.abs(a._4 - b._4) < 1e-12
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10),
                           prop)
    assert(res.passed, res.status.toString)
  }

  test("listing type rule respects share and support thresholds") {
    val subjects = Seq(
      // listing L1: 3 linked ents, 2 of type T (share 0.67 < 0.75) → no rule
      ("u", "L1", "e1"), ("u", "L1", "e2"), ("u", "L1", "e3"),
      // listing L2: 4 linked, 3 of type T (share 0.75) → rule fires
      ("u", "L2", "e1"), ("u", "L2", "e2"), ("u", "L2", "e4"), ("u", "L2", "e3"),
      // listing L3: 1 linked of type T (support 1 < 2) → no rule
      ("u", "L3", "e1"))
      .toDF("url", "listing_key", "ent")
    val seedTypes = Seq(("e1", "T"), ("e2", "T"), ("e4", "T"), ("e3", "U"))
      .toDF("ent", "tpe")
    val rules = RuleMining.listingTypeRules(subjects, seedTypes)
      .as[(String, String, String)].collect().toSet
    assert(rules == Set(("u", "L2", "T")))
  }

  test("every qualifying type asserts, not just the argmax") {
    // both entities typed Person AND Agent (transitive seed types): both
    // types have share 1.0 — the reference asserts each qualifying rule,
    // and an argmax-by-name would systematically keep only the generic
    // 'Agent', losing the specific 'Person'
    val subjects = Seq(("u", "L", "e1"), ("u", "L", "e2"))
      .toDF("url", "listing_key", "ent")
    val seedTypes = Seq(("e1", "Agent"), ("e1", "Person"),
                        ("e2", "Agent"), ("e2", "Person")).toDF("ent", "tpe")
    val rules = RuleMining.listingTypeRules(subjects, seedTypes)
      .as[(String, String, String)].collect().toSet
    assert(rules == Set(("u", "L", "Agent"), ("u", "L", "Person")))
    // relations: two objects can both clear the bar for one pred
    val rels = Seq(("e1", "p", "x"), ("e1", "p", "y"),
                   ("e2", "p", "x"), ("e2", "p", "y")).toDF("sub", "pred", "obj")
    val rr = RuleMining.listingRelationRules(subjects, rels)
      .as[(String, String, String, String)].collect().toSet
    assert(rr == Set(("u", "L", "p", "x"), ("u", "L", "p", "y")))
  }
}
