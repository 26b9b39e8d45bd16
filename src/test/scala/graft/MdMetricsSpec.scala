package graft

import graft.emit.MdMetrics
import graft.emit.MdMetrics.Span
import graft.listings.ListingExtract
import graft.ops.MdQueries
import graft.sources.GoldStandard

/** SETagsEvaluator port (`mention_detection/evaluation/metrics.py:12-158`):
  * hand-computed counter goldens per scenario, the token-walk subtleties,
  * and the gold-TSV wiring over the heuristic scorer's output. */
class MdMetricsSpec extends SparkSuite {
  import spark.implicits._

  private def counts(preds: Seq[Span], trues: Seq[Span])
      : Map[String, (Long, Long, Long, Long, Long)] =
    MdMetrics.classify(preds, trues).toMap

  // — token walk (metrics.py:141-158) —

  test("collectEntities: basic spans + trailing entity") {
    assert(MdMetrics.collectEntities(Seq(0, 1, 1, 0, 2, 2, 2)) ==
      Seq(Span("1", 1, 3), Span("2", 4, 7))) // trailing closes at EOS
    assert(MdMetrics.collectEntities(Seq(0, 0)) == Nil)
    assert(MdMetrics.collectEntities(Seq(3)) == Seq(Span("3", 0, 1)))
  }

  test("collectEntities: a different nonzero id mid-entity does NOT split") {
    // reference: elif ent_type is None — so ids 1,2 form ONE entity typed 1
    assert(MdMetrics.collectEntities(Seq(1, 2, 0)) == Seq(Span("1", 0, 2)))
  }

  test("maskedPair compresses offsets over kept positions (metrics.py:30-36)") {
    val (p, g) = MdMetrics.maskedPair(Seq(5, 0, 6), Seq(-100, 0, 6))
    assert(p == Seq(Span("6", 1, 2)) && g == Seq(Span("6", 1, 2)))
  }

  // — scenario goldens (metrics.py:45-117; counters are
  //   (correct, incorrect, partial, missed, spurious)) —

  test("scenario I: exact span + type is correct in all four schemas") {
    val c = counts(Seq(Span("a", 0, 3)), Seq(Span("a", 0, 3)))
    MdMetrics.Schemas.foreach(s => assert(c(s) == ((1L, 0L, 0L, 0L, 0L)), s))
  }

  test("scenario IV: exact offsets, wrong type") {
    val c = counts(Seq(Span("b", 0, 3)), Seq(Span("a", 0, 3)))
    assert(c("strict") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("ent_type") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("exact") == ((1L, 0L, 0L, 0L, 0L)))
    assert(c("partial") == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("scenario V: overlap, same type") {
    val c = counts(Seq(Span("a", 1, 4)), Seq(Span("a", 0, 3)))
    assert(c("strict") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("ent_type") == ((1L, 0L, 0L, 0L, 0L)))
    assert(c("exact") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("partial") == ((0L, 0L, 1L, 0L, 0L)))
  }

  test("scenario VI: overlap, wrong type") {
    val c = counts(Seq(Span("b", 1, 4)), Seq(Span("a", 0, 3)))
    assert(c("strict") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("ent_type") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("exact") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c("partial") == ((0L, 0L, 1L, 0L, 0L)))
  }

  test("scenarios II + III: spurious and missed hit all four schemas") {
    val c = counts(Seq(Span("a", 10, 12)), Seq(Span("a", 0, 3)))
    MdMetrics.Schemas.foreach(s => assert(c(s) == ((0L, 0L, 0L, 1L, 1L)), s))
  }

  test("zero-length pred inside a gold is SPURIOUS, not an overlap " +
       "(reference range-set intersection — an empty range overlaps nothing)") {
    val c = counts(Seq(Span("a", 2, 2)), Seq(Span("a", 0, 3)))
    MdMetrics.Schemas.foreach(s => assert(c(s) == ((0L, 0L, 0L, 1L, 1L)), s))
    // …but scenario IV's offset-equality test has no emptiness guard in
    // the reference, so equal degenerate offsets with a wrong type still
    // classify IV
    val c4 = counts(Seq(Span("b", 2, 2)), Seq(Span("a", 2, 2)))
    assert(c4("strict") == ((0L, 1L, 0L, 0L, 0L)))
    assert(c4("exact") == ((1L, 0L, 0L, 0L, 0L)))
  }

  test("multi-overlap: the FIRST gold in (start,end,tag) order decides, " +
       "later overlapped golds stay missed") {
    // pred [2,6) overlaps both golds; g1=[0,3) sorts first, same tag → V;
    // g2=[5,8) is never marked → missed
    val c = counts(Seq(Span("a", 2, 6)), Seq(Span("a", 0, 3), Span("a", 5, 8)))
    assert(c("strict") == ((0L, 1L, 0L, 1L, 0L)))
    assert(c("ent_type") == ((1L, 0L, 0L, 1L, 0L)))
    // and with g1 typed differently the same pred flips to VI
    val c2 = counts(Seq(Span("a", 2, 6)), Seq(Span("b", 0, 3), Span("a", 5, 8)))
    assert(c2("ent_type") == ((0L, 1L, 0L, 1L, 0L)))
  }

  test("set semantics: duplicate spans collapse before counting") {
    val c = counts(Seq(Span("a", 0, 3), Span("a", 0, 3)),
                   Seq(Span("a", 0, 3), Span("a", 0, 3)))
    assert(c("strict") == ((1L, 0L, 0L, 0L, 0L)))
  }

  // — DataFrame evaluation + P/R (metrics.py:120-139) —

  test("evaluate: per-listing-type counters, overall rollup, schema P/R") {
    val pred = Seq(
      ("e1", "enum", "a", 0, 3),  // I
      ("e2", "table", "a", 1, 4), // V vs (a,0,3)
      ("e2", "table", "z", 9, 11) // spurious
    ).toDF("example", "listing_type", "tag", "start", "end")
    val gold = Seq(
      ("e1", "enum", "a", 0, 3),
      ("e2", "table", "a", 0, 3),
      ("e3", "enum", "b", 0, 2)   // example with no preds at all → missed
    ).toDF("example", "listing_type", "tag", "start", "end")
    val out = MdMetrics.evaluate(pred, gold)
      .select("listing_type", "eval_schema", "correct", "incorrect",
              "partial", "missed", "spurious", "possible", "precision",
              "recall")
      .as[(String, String, Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(out.size == 12) // (enum, table, overall) × 4 schemas
    // overall strict: I correct, V incorrect, 1 spurious, 1 missed
    assert(out(("overall", "strict"))._3 == 1L)
    assert(out(("overall", "strict"))._4 == 1L)
    assert(out(("overall", "strict"))._6 == 1L)
    assert(out(("overall", "strict"))._7 == 1L)
    assert(out(("overall", "strict"))._8 == 3L) // possible
    assert(out(("overall", "strict"))._9 == 0.333333) // P = 1/3
    // partial schema: V counts half — P = (1 + 0.5)/3, R = 1.5/3
    assert(out(("overall", "partial"))._10 == 0.5)
    // per-type slices
    assert(out(("enum", "strict"))._3 == 1L)   // e1 correct, e3 missed
    assert(out(("enum", "strict"))._6 == 1L)
    assert(out(("table", "strict"))._4 == 1L)  // e2: V + spurious
    assert(out(("table", "strict"))._7 == 1L)
  }

  test("evaluateTokens: chunk-level ids with ignore mask (EvalPrediction)") {
    val chunks = Seq(
      // kept positions: ids (1,1,0,2) vs gold (1,1,0,1): pred spans
      // {1:[0,2), 2:[3,4)}, gold {1:[0,2), 1:[3,4)} → one I + one IV
      ("enum", Seq(1, 1, 0, 2, 9), Seq(1, 1, 0, 1, -100))
    ).toDF("listing_type", "pred_ids", "gold_ids")
    val out = MdMetrics.evaluateTokens(chunks)
      .select("listing_type", "eval_schema", "correct", "incorrect")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("enum", "strict")) == ((1L, 1L)))
    assert(out(("enum", "exact")) == ((2L, 0L)))
    assert(out(("overall", "ent_type")) == ((1L, 1L)))
  }

  // — the S5 gold-TSV wiring over the heuristic scorer (VERDICT r4 #2) —

  test("mdGoldEval: GoldStandard TSV vs ListingExtract mentions") {
    val text = Seq(
      "== Members ==",
      "* [[Alpha One]] — ok.",
      "* [[Beta Two]] — ok.",
      "* [[Gamma Three]] — ok.").mkString("\n")
    val items = ListingExtract.parsePage("u", text)
    val mentions = items
      .map(i => ("u", i.listing_key, i.item_idx, i.mention_id, i.label))
      .toDF("url", "listing_key", "item_idx", "mention_id", "label")
    val dir = SparkSuite.tempDir("graft-mdgold")
    val tsv = s"$dir/md_gold.tsv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tsv),
      "label\tpage_url\tlink\ttopsection\tsection\tlisting_id\tlisting_type\texample\n" +
      // exact match: scorer tags Alpha One TITLE; Beta Two also sits in the
      // item text beside the link → a spurious pred on this example
      "TITLE\tu\tAlpha One\tMembers\tM\t1\tWikiEnum\t* [[Alpha One]] — ok. Beta Two came.\n" +
      // gold says ALLCAPS, scorer's shape tag is TITLE → scenario IV
      "ALLCAPS\tu\tBeta Two\tMembers\tM\t1\tWikiEnum\t* [[Beta Two]] — ok.\n" +
      // an item the scorer never saw → missed
      "TITLE\tu\tMissing Person\tMembers\tM\t1\tWikiEnum\t* [[Missing Person]] — gone.\n")
    val gold = GoldStandard.readMentionGold(spark, tsv)
    val out = MdQueries.mdGoldEval(mentions, gold)
      .select("listing_type", "eval_schema", "correct", "incorrect",
              "partial", "missed", "spurious", "precision", "recall")
      .as[(String, String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // overall: I (Alpha One), IV (Beta Two), 1 spurious, 1 missed
    val strict = out(("overall", "strict"))
    assert((strict._3, strict._4, strict._5, strict._6, strict._7) ==
           ((1L, 1L, 0L, 1L, 1L)))
    assert(strict._8 == 0.333333 && strict._9 == 0.333333)
    val exact = out(("overall", "exact"))
    assert((exact._3, exact._4, exact._6, exact._7) == ((2L, 0L, 1L, 1L)))
    assert(exact._8 == 0.666667 && exact._9 == 0.666667)
    val entType = out(("overall", "ent_type"))
    assert((entType._3, entType._4) == ((1L, 1L)))
    // the per-listing-type slice carries the TSV's WikiEnum key
    assert(out.contains(("WikiEnum", "strict")))
  }
}
