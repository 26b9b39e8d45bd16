package graft

import org.apache.spark.sql.functions._
import graft.canonical.{AlignmentGraph, ConnectedComponents, NastyLinker}

/** r6 optimization equivalence gates: the key-contracted component
  * computation ([[AlignmentGraph.components]]), the closed-form MM
  * components ([[AlignmentGraph.mmComponents]]), and NastyLinker's
  * clique-hinted NIL clustering must return EXACTLY what the generic
  * star-contraction loop returns over the full clique edge set — across
  * hot keys, singleton buckets, entity bridges, and ME-less keys. */
class AlignmentContractionSpec extends SparkSuite {
  import spark.implicits._

  // cap = 3 so "hotlabel" (4 mentions) is a HOT key: no MM edges, ME only
  private def withCap[A](f: => A): A = {
    spark.conf.set("graft.ed.maxKeyBucket", "3")
    try f finally spark.conf.unset("graft.ed.maxKeyBucket")
  }

  // keys: bridge (2 members, ME to A), lone (1 member, ME to A — entity
  // bridge to "bridge"), hotlabel (4 members, ME to H), island (3 members,
  // NO dict entry → MM-only component), solo (1 member, no dict → no edges)
  private val mentions = Seq(
    ("m01", "Bridge"), ("m02", "bridge"),
    ("m03", "Lone"),
    ("m04", "Hot Label"), ("m05", "hot-label"), ("m06", "hotlabel"),
    ("m07", "HOT label"),
    ("m08", "Island"), ("m09", "island"), ("m10", "ISLAND"),
    ("m11", "Solo only")
  ).toDF("mention_id", "label")

  private val dict = Seq(
    ("bridge", "A", 0.9), ("lone", "A", 0.8), ("lone", "B", 0.7),
    ("hotlabel", "H", 0.9))
    .toDF("key", "ent", "freq")

  private def edges(mmThr: Double) = AlignmentGraph.buildScored(
    mentions, dict, cand => cand.withColumn("score", col("freq")),
    meThreshold = 0.5, mmThreshold = mmThr)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.select("node", "component").as[(String, String)].collect().toSet

  test("components ≡ plain CC over the full clique edge set") {
    withCap {
      for (mmThr <- Seq(0.5, 1.0); keyDet <- Seq(false, true)) {
        val e = edges(mmThr).localCheckpoint()
        val got = asSet(AlignmentGraph.components(
          mentions, e.filter(col("dst").startsWith("e:")).select("src", "dst"),
          mmThr, None, keyDeterminedScores = keyDet))
        val want = asSet(ConnectedComponents.run(e.select("src", "dst")))
        assert(got == want, s"mmThr=$mmThr keyDet=$keyDet:\n$got\nvs\n$want")
      }
    }
  }

  test("mmComponents ≡ plain CC over the MM pair set") {
    withCap {
      val e = edges(0.5).localCheckpoint()
      val mmPairs = e.filter(col("dst").startsWith("m:"))
        .select(expr("substring(src, 3)").as("src"),
                expr("substring(dst, 3)").as("dst"))
      val got = asSet(AlignmentGraph.mmComponents(mentions, 0.5, None))
      val want = asSet(ConnectedComponents.run(mmPairs))
      assert(got == want, s"$got\nvs\n$want")
      // mmThreshold >= 1: no MM edges survive → empty
      assert(AlignmentGraph.mmComponents(mentions, 1.0, None).isEmpty)
    }
  }

  test("NastyLinker clique-hinted NIL clustering ≡ generic induced CC") {
    withCap {
      val e = edges(0.5).localCheckpoint()
      val hint = AlignmentGraph.mmCliqueHint(mentions, 0.5, None)
      def rows(h: Option[org.apache.spark.sql.DataFrame]) =
        AlignmentGraph.clusterEdges(mentions, e, 0.75, null, None, h)
          .as[(String, Option[String], String)].collect().toSet
      assert(rows(Some(hint)) == rows(None))
    }
  }
}
