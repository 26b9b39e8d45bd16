package graft

import org.apache.spark.sql.functions._
import graft.ingest.TextExtract
import graft.testkit.CorpusGen

/** North-rule per-row invariant: extracted text is byte-identical per url —
  * vs the golden text column, across two runs, and across parallelism
  * levels (≙ the reference's fixed-seed reproducibility,
  * `evaluate_mention_detection.py:32-36`). */
class InvariantSpec extends SparkSuite {
  import spark.implicits._

  private lazy val pages = CorpusGen.default.pages.toDS().toDF()

  test("extracted text is byte-identical to the golden text column") {
    val extracted = TextExtract.extract(pages)
    val joined = extracted.alias("e")
      .join(pages.alias("p"), "url")
      .select(col("e.text").as("got"), col("p.text").as("want"))
    val mismatches = joined.filter(col("got") =!= col("want")).count()
    assert(mismatches == 0)
    // en pages only survive the language filter
    assert(extracted.count() == pages.filter(col("lang") === "en").count())
  }

  test("single-pass extraction == the 5-pass regex chain (adversarial)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Prop.propBoolean
    import org.scalacheck.Test.{check, Parameters}
    // targeted edges: tag junctions forming entities, unterminated tags,
    // nested '<', entity prefixes, pass-order composition cases
    val edges = Seq(
      "", "plain", "<b>x</b>", "a<b", "a<b<c>d", "<<a>", "a<b>..<c",
      "&lt;a>b", "&l<x>t;", "&amp;lt;", "&amp;gt;", "&&lt;", "&lt&lt;;",
      "<a&lt;>", "<a&lt;b", "&nbsp;&nbsp;", "&np;&gt;", "x&", "&",
      "&amp", "&lt", "<>", "< >", "tag<with attr='v'>text&amp;more")
    val df = edges.toDF("h")
    val twin = df.select(
      TextExtract.textFromHtmlStr(col("h")).as("native"),
      TextExtract.textFromHtmlRegex(col("h")).as("regex"))
    assert(twin.filter(col("native") =!= col("regex")).count() == 0)
    // property: random html-ish strings, driver-side java fn vs regex
    val htmlish: Gen[String] = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("<", ">", "&", ";", " "),
      2 -> Gen.oneOf("&lt;", "&gt;", "&nbsp;", "&amp;", "&am", "lt;"),
      1 -> Gen.oneOf("<b>", "</b>", "<x y>", "&l<x>t;"))).map(_.mkString)
    val regexRef: String => String = s =>
      s.replaceAll("<[^>]*>", "").replace("&lt;", "<").replace("&gt;", ">")
        .replace("&nbsp;", " ").replace("&amp;", "&")
    val prop = Prop.forAll(htmlish) { s =>
      val got = TextExtract.htmlToTextJava(s)
      val want = regexRef(s)
      (got == want) :| s"in=$s got=$got want=$want"
    }
    assert(check(Parameters.default.withMinSuccessfulTests(500), prop).passed)
  }

  test("extraction is invariant across runs and partitionings") {
    def hashAll(parts: Int): Array[(String, String)] =
      TextExtract.extract(pages.repartition(parts))
        .select(col("url"), sha2(col("text"), 256).as("h"))
        .as[(String, String)].collect().sorted
    val a = hashAll(1)
    val b = hashAll(7)
    val c = hashAll(7) // second run, same partitioning
    assert(a.sameElements(b) && b.sameElements(c))
  }
}
