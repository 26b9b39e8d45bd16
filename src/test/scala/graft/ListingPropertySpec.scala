package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.listings.ListingExtract

/** Property test: the zero-shuffle flatMap parser and the relational window
  * form must agree on RANDOM wiki-ish markup — sections, enums, tables with
  * random header rows, rowspan/colspan attributes, malformed rows, nested
  * tables, meta sections. The fixtures cover the designed cases; this
  * covers the ones nobody designed. */
class ListingPropertySpec extends SparkSuite {
  import spark.implicits._

  private val word: Gen[String] =
    Gen.oneOf("Alpha", "Beta", "Gamma", "Delta", "rock", "jazz", "x1", "y2")
  private val label: Gen[String] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private val enumLine: Gen[String] = for {
    l <- label
    tail <- Gen.oneOf(" — note.", "", " more")
  } yield s"* [[$l]]$tail"

  private val cellGen: Gen[String] = for {
    l <- label
    kind <- Gen.frequency(
      5 -> Gen.const(s"[[$l]] txt"),
      2 -> Gen.const("plain"),
      1 -> Gen.choose(2, 3).map(k => s"rowspan=\"$k\" | [[$l]]"),
      1 -> Gen.choose(2, 3).map(k => s"colspan=\"$k\" | [[$l]]"),
      1 -> Gen.const(""))
    c <- kind
  } yield c

  private val rowGen: Gen[Seq[String]] = for {
    nCells <- Gen.choose(1, 4)
    cells <- Gen.listOfN(nCells, cellGen)
    hdr <- Gen.frequency(6 -> false, 1 -> true)
  } yield {
    val sep = if (hdr) " !! " else " || "
    val mark = if (hdr) "!" else "|"
    Seq("|-", s"$mark ${cells.mkString(sep)}")
  }

  private val tableGen: Gen[Seq[String]] = for {
    header <- Gen.option(Gen.const("! H1 !! H2"))
    rows <- Gen.choose(1, 7).flatMap(n => Gen.listOfN(n, rowGen))
    closed <- Gen.frequency(8 -> true, 1 -> false) // truncated-crawl case
  } yield Seq("{|") ++ header.toSeq ++ rows.flatten ++
    (if (closed) Seq("|}") else Nil)

  private val sectionGen: Gen[Seq[String]] = for {
    name <- Gen.oneOf("Members", "Table", "See also", "Stuff")
    body <- Gen.frequency(
      3 -> Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, enumLine)),
      3 -> tableGen,
      1 -> Gen.const(Seq("prose line here.")))
  } yield s"== $name ==" +: body

  private val pageGen: Gen[String] =
    Gen.choose(1, 5).flatMap(n => Gen.listOfN(n, sectionGen))
      .map(_.flatten.mkString("\n"))

  test("flatMap parser == relational form on random markup (ScalaCheck)") {
    val prop = Prop.forAll(Gen.listOfN(4, pageGen)) { pages =>
      val df = pages.zipWithIndex
        .map { case (t, i) => (s"u$i", t) }.toDF("url", "text")
      val a = ListingExtract.mentions(df)
        .as[(String, String, Int, String, String)].collect().sorted.toSeq
      val b = ListingExtract.mentionsRelational(df)
        .select("url", "listing_key", "item_idx", "mention_id", "label")
        .as[(String, String, Int, String, String)].collect().sorted.toSeq
      val ok = a == b
      if (!ok) {
        println(s"MISMATCH\nflat=${a.take(10)}\nrel=${b.take(10)}")
        println(pages.mkString("\n<<<PAGE>>>\n"))
      }
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
