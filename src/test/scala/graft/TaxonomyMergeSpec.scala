package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.taxonomy.TaxonomyMerge

/** G8: the single orchestrated taxonomy merge — one fixture driven through
  * conceptual-filter → label-merge → cycle-resolution → hypernymy-filter →
  * transitive-reduction → append, every step's effect asserted. Pure
  * driver-side math (no Spark session). */
class TaxonomyMergeSpec extends AnyFunSuite {

  private val edges = Seq(
    ("Thing", "Persons"),
    ("Persons", "Scientists"),
    ("Thing", "Scientists"),                 // transitive (dropped in step 5)
    ("Persons", "Princesses by country"),    // merges with 'Princesses'
    ("Persons", "Princesses"),
    ("Scientists", "Chemists"),
    ("Chemists", "Scientists"),              // cycle back-edge (step 3)
    ("Persons", "London"),                   // London: non-conceptual (step 1)
    ("London", "Bridges"),                   // orphaned by the drop → root
    ("Thing", "Cities"),
    ("Cities", "Wildlife Artists"))          // non-hypernym edge (step 4)

  private val labels = edges.flatMap(e => Seq(e._1, e._2)).distinct
    .map(n => n -> n).toMap

  private val hyper = Set(
    ("person", "thing"), ("scientist", "person"), ("scientist", "thing"),
    ("princesse", "person"), ("chemist", "scientist"),
    ("city", "thing"), ("bridge", "thing"))

  test("the orchestrated merge applies every G3-G7 step in order") {
    val r = TaxonomyMerge.merge(edges, labels, root = "Thing",
      isHypernym = (c, p) => hyper((c, p)))
    assert(r.dropped == Set("London"), "non-conceptual node dropped")
    assert(r.merged == Map("Princesses by country" -> "Princesses"),
           "canonical-label merge into the lexicographically smallest node")
    val got = r.edges.toSet
    assert(got == Set(
      ("Thing", "Persons"),
      ("Persons", "Scientists"),          // the direct Thing edge reduced away
      ("Persons", "Princesses"),
      ("Scientists", "Chemists"),         // cycle resolved: back-edge dropped
      ("Thing", "Cities"),
      ("Thing", "Bridges"),               // orphan re-attached to root
      ("Thing", "Wildlife Artists")))     // non-hypernym edge cut, re-rooted
  }

  test("conceptual test matches the Column-path Categories.conceptual") {
    assert(TaxonomyMerge.isConceptual("Reptiles"))
    assert(TaxonomyMerge.isConceptual("Princesses by country"))
    assert(TaxonomyMerge.isConceptual("African musical instruments"))
    assert(!TaxonomyMerge.isConceptual("London"))
  }

  test("merge is input-order invariant") {
    val a = TaxonomyMerge.merge(edges, labels, "Thing",
      (c, p) => hyper((c, p)))
    val b = TaxonomyMerge.merge(edges.reverse, labels, "Thing",
      (c, p) => hyper((c, p)))
    assert(a.edges.toSet == b.edges.toSet && a.merged == b.merged)
  }
}
