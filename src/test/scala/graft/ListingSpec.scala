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
      "{|", "! Name !! Note",
      "|-", "| [[Delta Four]] || x", "|-",
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

  // — F7 goldens, one per reference rule (page_parser.py:382-420) —

  private def table(rows: String*): String =
    (Seq("== T ==", "{|") ++ rows ++ Seq("|}")).mkString("\n")

  private def labels(text: String): Seq[String] =
    ListingExtract.parsePage("u", text).map(_.label)

  test("F7: row 0 is the header even without header markup") {
    val t = table("|-", "| [[Header Like]] || x",
                  "|-", "| [[Row One]] || x",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x")
    assert(labels(t) == Seq("Row One", "Row Two", "Row Three"))
  }

  test("F7: any row containing a ! header cell is skipped as header") {
    val t = table("! A !! B",
                  "|-", "| [[Row One]] || x",
                  "|-", "! mid !! header",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x")
    assert(labels(t) == Seq("Row One", "Row Two", "Row Three"))
  }

  test("F7: rows under a rowspan are skipped; the spanning row is kept") {
    val t = table("! A !! B",
                  "|-", "| rowspan=\"2\" | [[Spanner Kept]] || x",
                  "|-", "| [[Under Span]] skipped",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x")
    assert(labels(t) == Seq("Spanner Kept", "Row Two", "Row Three"))
  }

  test("F7: colspan rows are skipped (span-expanded != raw)") {
    val t = table("! A !! B",
                  "|-", "| colspan=\"2\" | [[Wide Dropped]]",
                  "|-", "| [[Row One]] || x",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x")
    assert(labels(t) == Seq("Row One", "Row Two", "Row Three"))
  }

  test("F7: a <2-cell row kills the whole table") {
    val t = table("! A !! B",
                  "|-", "| [[Row One]] || x",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x",
                  "|-", "| lonely")
    assert(labels(t).isEmpty)
  }

  test("F7: a >100-cell row kills the whole table") {
    val wide = "| " + (1 to 101).map(i => s"c$i").mkString(" || ")
    val t = table("! A !! B",
                  "|-", "| [[Row One]] || x",
                  "|-", "| [[Row Two]] || x",
                  "|-", "| [[Row Three]] || x",
                  "|-", wide)
    assert(labels(t).isEmpty)
  }

  test("F7: tables with <3 data rows are dropped") {
    val t = table("! A !! B",
                  "|-", "| [[Row One]] || x",
                  "|-", "| [[Row Two]] || x")
    assert(labels(t).isEmpty)
  }

  test("F7: a table left unclosed at end-of-page still parses (truncated crawl)") {
    val t = Seq("== T ==", "{|", "! A !! B",
                "|-", "| [[Row One]] || x",
                "|-", "| [[Row Two]] || x",
                "|-", "| [[Row Three]] || x").mkString("\n") // no |}
    assert(labels(t) == Seq("Row One", "Row Two", "Row Three"))
  }

  test("F7: two surviving tables in one section get distinct listing keys") {
    val t = (Seq("== T ==") ++
      Seq("{|", "! A !! B",
          "|-", "| [[One A]] || x", "|-", "| [[One B]] || x",
          "|-", "| [[One C]] || x", "|}") ++
      Seq("{|", "! A !! B",
          "|-", "| [[Two A]] || x", "|-", "| [[Two B]] || x",
          "|-", "| [[Two C]] || x", "|}")).mkString("\n")
    val got = ListingExtract.parsePage("u", t)
    assert(got.map(m => (m.listing_key, m.label)) == Seq(
      ("table:T", "One A"), ("table:T", "One B"), ("table:T", "One C"),
      ("table:T#1", "Two A"), ("table:T#1", "Two B"), ("table:T#1", "Two C")))
  }
}
