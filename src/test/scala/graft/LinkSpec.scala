package graft

import org.apache.spark.sql.functions._
import graft.link.AliasLink
import graft.testkit.CorpusGen

/** The salted shuffle-join fallback must produce exactly the broadcast
  * path's results (salting is physical, never semantic), and ambiguous
  * aliases must resolve to the highest-prior entity deterministically. */
class LinkSpec extends SparkSuite {
  import spark.implicits._

  private lazy val world = CorpusGen.default
  private lazy val mentions = graft.listings.ListingExtract.mentions(
    graft.ingest.TextExtract.extract(world.pages.toDS().toDF()))
  private lazy val dict = AliasLink.buildDict(
    AliasLink.foldRedirects(world.aliases.toDF("alias", "ent", "freq", "is_hot"),
                            world.redirects.toDF("src", "dst")))

  test("salted shuffle join == broadcast join (linked and unlinked)") {
    val (bl, bu) = AliasLink.link(mentions, dict)
    val (sl, su) = AliasLink.linkShuffle(mentions, dict)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("mention_id", "label").as[(String, String)].collect().sorted
    def linkedRows(df: org.apache.spark.sql.DataFrame) =
      df.select("mention_id", "ent").as[(String, String)].collect().sorted
    assert(linkedRows(bl).sameElements(linkedRows(sl)))
    assert(rows(bu).sameElements(rows(su)))
  }

  test("scorer seam: prior scorer == broadcast link; context scorer overrides") {
    // with scorer = prior the mention-side argmax must equal the
    // dict-side-reduced broadcast path exactly
    val (bl, bu) = AliasLink.link(mentions, dict)
    val (pl, pu) = AliasLink.linkScored(mentions, dict, col("freq"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("mention_id", "label").as[(String, String)].collect().sorted
    def linkedRows(df: org.apache.spark.sql.DataFrame) =
      df.select("mention_id", "ent").as[(String, String)].collect().sorted
    assert(linkedRows(bl).sameElements(linkedRows(pl)))
    assert(rows(bu).sameElements(rows(pu)))
    // a context-dependent scorer (deterministic cross-encoder stand-in:
    // page-url affinity) must flip the ambiguous alias away from the prior
    val contextScore =
      when(col("url").contains("people-called-ada") &&
           col("ent") === "Ada Prime B", 10.0).otherwise(col("freq"))
    val (cl, _) = AliasLink.linkScored(mentions, dict, contextScore)
    val ada = cl.filter(col("label") === "Ada Prime")
      .select("ent").distinct().as[String].collect()
    assert(ada.toSeq == Seq("Ada Prime B"), "context must override the prior")
  }

  test("ambiguous hot alias resolves to the highest-prior entity") {
    val (linked, _) = AliasLink.link(mentions, dict)
    val ada = linked.filter(col("label") === "Ada Prime")
      .select("ent").distinct().as[String].collect()
    assert(ada.toSeq == Seq("Ada Prime A")) // prior 0.7 beats 0.3
  }

  test("labels that normalize to the empty key never link") {
    // a punctuation-only alias normalizes to key "" — with it in the dict,
    // every CJK/punctuation label would vacuously "link" to its entity
    // instead of falling to the NIL path
    val aliases = Seq(("···", "Bogus_Ent", 9.0, false),
                      ("Real Name", "Real_Ent", 1.0, false))
      .toDF("alias", "ent", "freq", "is_hot")
    val d = AliasLink.buildDict(aliases)
    assert(d.filter(length(col("key")) === 0).count() == 0)
    val ms = Seq(("u", "l", 0, "m1", "★★"), ("u", "l", 1, "m2", "Real Name"))
      .toDF("url", "listing_key", "item_idx", "mention_id", "label")
    val joined = AliasLink.linkAll(ms, d)
    val byId = joined.select("mention_id", "ent").as[(String, String)]
      .collect().toMap
    assert(byId("m1") == null) // NOT Bogus_Ent
    assert(byId("m2") == "Real_Ent")
  }

  test("unlinked mentions carry their alias key for canonicalization") {
    val (_, unlinked) = AliasLink.link(mentions, dict)
    val keys = unlinked.select("key").distinct().as[String].collect()
    assert(keys.nonEmpty && keys.forall(k =>
      k.startsWith("mystery") || k.startsWith("mixedmystery") ||
      k.startsWith("spankeep") || k == "loremipsumfiller"))
  }

  test("spelling redirect folds into the dictionary (lev guard holds)") {
    val (linked, _) = AliasLink.link(mentions, dict)
    val viaRedirect = linked.filter(col("label") === "Ada Prime AA")
      .select("ent").distinct().as[String].collect()
    assert(viaRedirect.toSeq == Seq("Ada Prime A"))
    // a non-spelling redirect (lev > 2) must NOT fold
    val far = AliasLink.foldRedirects(
      Seq(("Ada Prime A", "Ada Prime A", 1.0, false))
        .toDF("alias", "ent", "freq", "is_hot"),
      Seq(("Completely Different", "Ada Prime A")).toDF("src", "dst"))
    assert(far.count() == 1)
  }
}
