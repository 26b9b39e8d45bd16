package graft

import graft.listings.ListingExtract
import graft.testkit.CorpusGen

/** The zero-shuffle flatMap parser and the relational window form must be
  * row-for-row identical. */
class ListingSpec extends SparkSuite {
  import spark.implicits._

  test("flatMap parser == relational window form on the full corpus") {
    val pagesText = graft.ingest.TextExtract.extract(
      CorpusGen.default.pages.toDS().toDF())
    val a = ListingExtract.mentions(pagesText)
      .as[(String, String, Int, String, String)].collect().sorted
    val b = ListingExtract.mentionsRelational(pagesText)
      .select("url", "listing_key", "item_idx", "mention_id", "label")
      .as[(String, String, Int, String, String)].collect().sorted
    assert(a.sameElements(b), s"flat=${a.length} rel=${b.length}")
    assert(a.nonEmpty)
  }

  test("parsePage handles meta sections, short listings, tables, validity") {
    val text = Seq(
      "== Members ==",
      "* [[Alpha One]] — ok.",
      "* [[Beta Two]] — ok.",
      "* [[42]] — invalid: digits.",
      "* no link here.",
      "* [[Gamma Three]] — ok.",
      "== See also ==",
      "* [[Hidden One]]", "* [[Hidden Two]]", "* [[Hidden Three]]",
      "== Table ==",
      "{|", "|-", "| [[Delta Four]] || x", "|-",
      "| [[Epsilon Five]] || y", "|-", "| [[Zeta Six]] || z", "|}",
      "== Tiny ==",
      "* [[Too Few]]", "* [[Also Few]]").mkString("\n")
    val got = ListingExtract.parsePage("u", text)
    assert(got.map(_.label) ==
      Seq("Alpha One", "Beta Two", "Gamma Three",
          "Delta Four", "Epsilon Five", "Zeta Six"))
    assert(got.filter(_.listing_key == "enum:Members").map(_.item_idx) ==
      Seq(1, 2, 5)) // idx counts all items incl. invalid ones
  }
}
