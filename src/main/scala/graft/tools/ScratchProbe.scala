package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable stage-cost probe for optimization work (not part of the
  * driver contract; safe to delete). Profiles the ED subjects_ed stage's
  * internal phases on the bench corpus shape. */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    import spark.implicits._

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f"); r
    }

    val world = graft.testkit.CorpusGen.World(nCountries = 250,
                                              knownPerListing = 12)
    val base = spark.createDataset(world.pages).toDF()
    val pages = base
      .crossJoin(spark.range(8).select(col("id").as("rep")))
      .withColumn("url", concat(col("url"), lit("?rep="), col("rep")))
      .drop("rep").localCheckpoint()
    println("pages " + pages.count())
    val seeds = world.seeds(spark)
    val dict = graft.link.AliasLink.buildDict(seeds.aliases).localCheckpoint()
    val pagesText = t("extract")(
      graft.ingest.TextExtract.extract(pages).localCheckpoint())
    val mentions = t("mentions")(
      graft.listings.ListingExtract.mentions(pagesText).localCheckpoint())
    println("mentions " + mentions.count())
    val all = t("linkAll")(
      graft.link.AliasLink.linkAll(mentions, dict).localCheckpoint())
    (1 to 2).foreach { _ =>
      val edges = t("buildScored+cp")(
        graft.canonical.AlignmentGraph.buildScored(
          all.select("mention_id", "label"), dict,
          cand => cand.withColumn("score", col("freq")), 0.5, 0.5)
        .localCheckpoint())
      val cc = t("components+cp")(
        graft.canonical.AlignmentGraph.components(
          all.select("mention_id", "label"),
          edges.filter(col("dst").startsWith("e:")).select("src", "dst"),
          0.5, None, keyDeterminedScores = true)
          .localCheckpoint())
      println("cc nodes " + cc.count())
      t("clusterEdges+hint")(
        graft.canonical.AlignmentGraph.clusterEdges(
          all.select("mention_id", "label"), edges, 0.75, null, Some(cc),
          nilCliqueHint = Some(graft.canonical.AlignmentGraph.mmCliqueHint(
            all.select("mention_id", "label"), 0.5, None)))
        .count())
    }
    locally {
      val edges = graft.canonical.AlignmentGraph.buildScored(
          all.select("mention_id", "label"), dict,
          cand => cand.withColumn("score", col("freq")), 0.5, 0.5)
        .localCheckpoint()
      val cc = graft.canonical.AlignmentGraph.components(
        all.select("mention_id", "label"),
        edges.filter(col("dst").startsWith("e:")).select("src", "dst"),
        0.5, None, keyDeterminedScores = true).localCheckpoint()
      val hint = graft.canonical.AlignmentGraph.mmCliqueHint(
        all.select("mention_id", "label"), 0.5, None)
      val withHint = graft.canonical.AlignmentGraph.clusterEdges(
        all.select("mention_id", "label"), edges, 0.75, null, Some(cc),
        Some(hint)).localCheckpoint()
      val noHint = graft.canonical.AlignmentGraph.clusterEdges(
        all.select("mention_id", "label"), edges, 0.75, null, Some(cc),
        None).localCheckpoint()
      val d = withHint.unionByName(noHint)
        .groupBy("mention_id", "ent", "cluster_id")
        .agg(count(lit(1)).as("c")).filter(col("c") =!= 2).count()
      println(s"EQUIV clusterEdges diff=$d n=${withHint.count()}")
    }
    // equivalence gate: contracted components == plain CC over full edges
    val edges = graft.canonical.AlignmentGraph.buildScored(
        all.select("mention_id", "label"), dict,
        cand => cand.withColumn("score", col("freq")), 0.5, 0.5)
      .localCheckpoint()
    val ccNew = graft.canonical.AlignmentGraph.components(
      all.select("mention_id", "label"),
      edges.filter(col("dst").startsWith("e:")).select("src", "dst"),
      0.5, None, keyDeterminedScores = true).localCheckpoint()
    val ccOld = graft.canonical.ConnectedComponents
      .run(edges.select("src", "dst")).localCheckpoint()
    val diff = ccNew.unionByName(ccOld)
      .groupBy("node", "component").agg(count(lit(1)).as("c"))
      .filter(col("c") =!= 2).count()
    println(s"EQUIV components diff=$diff new=${ccNew.count()} old=${ccOld.count()}")
    // size of the CONTRACTED graph CC actually iterates over: replicate
    // components()'s meC construction and count the symmetrized distinct
    // edge set (the ConnectedComponents driver-path gate reads this count)
    locally {
      val keyed = graft.canonical.AlignmentGraph.graphMentions(
        all.select("mention_id", "label"))
      val m2rep = keyed.join(
        keyed.groupBy("key").agg(min("mention_id").as("rep")), "key")
      val meC = edges.filter(col("dst").startsWith("e:"))
        .select(expr("substring(src, 3)").as("mid"), col("dst"))
        .join(m2rep.select(col("mention_id").as("mid"), col("rep")),
              Seq("mid"), "left")
        .select(concat(lit("m:"), coalesce(col("rep"), col("mid"))).as("src"),
                col("dst"))
      val sym = meC.select("src", "dst")
        .unionByName(meC.select(col("dst").as("src"), col("src").as("dst")))
        .filter(col("src") =!= col("dst")).distinct()
      println("CONTRACTED meC rows=" + meC.count() +
              " symDistinct=" + sym.count())
    }
    // decompose components(): m2rep build vs CC vs expansion
    (1 to 2).foreach { _ =>
      val keyed = graft.canonical.AlignmentGraph.graphMentions(
        all.select("mention_id", "label"))
      val m2rep = t("cmp:m2rep+cp")(
        keyed
          .join(keyed.groupBy("key").agg(min("mention_id").as("rep"),
                                         count(lit(1)).as("bsize")), "key")
          .select(col("mention_id"), col("rep"), col("bsize"),
                  lit(false).as("is_hot"))
          .localCheckpoint())
      val meC = edges.filter(col("dst").startsWith("e:"))
        .select(expr("substring(src, 3)").as("mid"), col("dst"))
        .join(m2rep.select(col("mention_id").as("mid"), col("rep")),
              Seq("mid"), "left")
        .select(concat(lit("m:"), coalesce(col("rep"), col("mid"))).as("src"),
                col("dst"))
      val ccSmall = t("cmp:ccRun+cp")(
        graft.canonical.ConnectedComponents.run(meC).localCheckpoint())
      val expanded = m2rep
        .select(concat(lit("m:"), col("mention_id")).as("node"),
                concat(lit("m:"), col("rep")).as("rep_node"),
                col("bsize"), col("is_hot"))
        .join(ccSmall.select(col("node").as("rep_node"), col("component")),
              Seq("rep_node"), "left")
        .filter((!col("is_hot") && col("bsize") >= 2) ||
                col("component").isNotNull)
        .select(col("node"),
                coalesce(col("component"), col("rep_node")).as("component"))
      val repNodes = m2rep
        .select(concat(lit("m:"), col("rep")).as("node")).distinct()
      val passThrough = ccSmall.join(repNodes, Seq("node"), "left_anti")
      t("cmp:expand+cp")(
        expanded.unionByName(passThrough).localCheckpoint())
    }
    spark.stop()
  }
}
