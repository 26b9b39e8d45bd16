package graft

import org.apache.spark.sql.functions._
import graft.canonical.EdinCluster
import graft.emit.Stats
import graft.mine.{Categories, WeakLabels}
import graft.sources.GoldStandard
import graft.taxonomy.Disjointness

class ClusterMiscSpec extends SparkSuite {
  import spark.implicits._

  test("EDIN cluster: single-entity pass-through, majority attach, NIL") {
    val edges = Seq(
      // component 1: one entity, two mentions → pass through
      ("m:1", "e:A"), ("m:2", "m:1"),
      // component 2: two entities; m:3 votes A twice + B once → attach A;
      // m:4 votes B and C (no majority >= 0.75) → NIL; m:5 no entity edge → NIL
      ("m:3", "e:AA"), ("m:3", "e:AA"), ("m:3", "e:BB"),
      ("m:4", "e:BB"), ("m:4", "e:CC"), ("m:5", "m:4"),
      ("e:AA", "e:BB") // ties the component together
    ).toDF("src", "dst")
    val got = EdinCluster.cluster(edges, minShare = 0.6)
      .as[(String, Option[String])].collect().toMap
    assert(got("1").contains("A") && got("2").contains("A"))
    assert(got("3").contains("AA")) // 2/3 votes >= 0.6
    assert(got("4").isEmpty && got("5").isEmpty)
  }

  test("weak labels: positive via closure, negative via disjointness") {
    val mentions = Seq(("m1", "e1", "Person"), ("m2", "e2", "Person"),
                       ("m3", "e3", "Person"))
      .toDF("mention_id", "ent", "listing_type")
    val types = Seq(("e1", "Scientist"), ("e2", "City"), ("e3", "Unknown"))
      .toDF("ent", "tpe")
    val taxonomy = Seq(("Scientist", "Person"), ("City", "Place"),
                       ("Person", "Thing"), ("Place", "Thing"))
      .toDF("child", "parent")
    val closure = Disjointness.closureWithSelf(taxonomy)
    val disjoint = Seq(("Place", "Person"), ("Person", "Place"))
      .toDF("type_a", "type_b")
    val got = WeakLabels.label(mentions, types, closure, disjoint)
      .as[(String, String)].collect().toMap
    assert(got == Map("m1" -> "positive", "m2" -> "negative",
                      "m3" -> "abstain"))
  }

  test("category filters: meta drop and conceptual plural-head") {
    val cats = Seq("Princesses by country", "Hidden categories",
                   "Berlin (city)", "Stub articles", "French cities")
      .toDF("label")
    val kept = Categories.dropMeta(cats).as[String].collect().toSet
    assert(kept == Set("Princesses by country", "Berlin (city)",
                       "French cities"))
    val conceptual = Categories.conceptual(Categories.dropMeta(cats))
      .as[String].collect().toSet
    assert(conceptual == Set("Princesses by country", "French cities"))
  }

  test("gold-standard readers parse TSV and JSONL") {
    val dir = SparkSuite.tempDir("graft-gold")
    val tsv = s"$dir/md_gold.tsv"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tsv),
      "label\tpage_url\tlink\ttopsection\tsection\tlisting_id\tlisting_type\texample\n" +
      "PERSON\thttps://x/1\tAda\tMembers\tPeople\t1\tWikiEnum\tAda Prime\n")
    val md = GoldStandard.readMentionGold(spark, tsv)
    assert(md.count() == 1 &&
           md.select("label").as[String].head() == "PERSON")
    val jsonl = s"$dir/nilk.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(jsonl),
      """{"id": 1, "text": "a"}""" + "\n" + """{"id": 2, "text": "b"}""" + "\n")
    assert(GoldStandard.readJsonl(spark, jsonl).count() == 2)
  }

  test("KG stats report + JSON sink") {
    val triples = Seq(
      ("Ada", "rdf:type", "Scientist", false),
      ("new:x", "rdf:type", "Film", false),
      ("Ada", "rdfs:label", "Ada", true))
      .toDF("subj", "pred", "obj", "is_literal")
    val stats = Stats.kgStats(triples).as[(String, Double)].collect().toMap
    assert(stats("triples_total") == 3.0)
    assert(stats("entities") == 2.0 && stats("new_entities") == 1.0)
    assert(stats("triples_rdf:type") == 2.0)
    val json = Stats.toJson(Stats.kgStats(triples))
    assert(json.contains("\"triples_total\": 3.0"))
  }
}
