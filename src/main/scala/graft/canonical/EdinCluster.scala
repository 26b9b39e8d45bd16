package graft.canonical

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EDIN-style cluster→entity attachment and the NastyLinker validity split
  * (G10/G12; reference: `/root/reference/impl/subject_entity/entity_disambiguation/matching/greedy_clustering.py:71-137`).
  *
  * Input: a mention—mention/mention—entity alignment graph. Components are
  * computed by [[ConnectedComponents]]; then:
  *  - components containing exactly ONE entity keep it (the pass-through
  *    rule, greedy_clustering.py:71-77);
  *  - components with >1 entity are INVALID: mentions attach to the entity
  *    the majority of their direct edges agree on IF that majority reaches
  *    `minShare` (≙ EDIN's threshold attach, greedy_clustering.py:118-127),
  *    else they form a new (NIL) cluster — a deterministic, relational
  *    simplification of NastyLinker's Dijkstra split (G10), which the
  *    reference itself falls back from for single-entity components.
  */
object EdinCluster {

  /** edges(src, dst[, weight]): mention ids prefixed "m:", entity ids
    * prefixed "e:". Returns (mention_id, ent | null) — null = NIL. */
  def cluster(edges: DataFrame, minShare: Double = 0.75): DataFrame = {
    val cc = ConnectedComponents.run(edges)
    val entsPerComp = cc.filter(col("node").startsWith("e:"))
      .groupBy("component")
      .agg(countDistinct("node").as("n_ents"),
           min("node").as("only_ent"))
    val mentions = cc.filter(col("node").startsWith("m:"))
      .select(expr("substring(node, 3)").as("mention_id"), col("component"))

    // single-entity components: pass through
    val single = mentions
      .join(entsPerComp.filter(col("n_ents") === 1), "component")
      .select(col("mention_id"),
              expr("substring(only_ent, 3)").as("ent"))

    // multi-entity components: per-mention majority over DIRECT edges
    val multiComps = entsPerComp.filter(col("n_ents") > 1).select("component")
    val bidir = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
    val mentionEntEdges = bidir
      .filter(col("src").startsWith("m:") && col("dst").startsWith("e:"))
      .select(expr("substring(src, 3)").as("mention_id"),
              expr("substring(dst, 3)").as("ent"))
    val inMulti = mentions.join(multiComps, "component")
      .select("mention_id")
    val votes = mentionEntEdges.join(inMulti, "mention_id")
      .groupBy("mention_id", "ent").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("mention_id")
    val attached = votes
      .withColumn("share", col("cnt") / sum("cnt").over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("cnt").desc, col("ent").asc)))
      .filter(col("rn") === 1)
      .select(col("mention_id"),
              when(col("share") >= minShare, col("ent")).as("ent"))
    val unattached = inMulti
      .join(votes.select("mention_id").distinct(), Seq("mention_id"),
            "left_anti")
      .withColumn("ent", lit(null).cast("string"))

    single.unionByName(attached).unionByName(unattached)
  }
}
