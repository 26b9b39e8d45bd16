package graft.mine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weak-label generation for mention-detection training (M3; reference:
  * `/root/reference/impl/subject_entity/mention_detection/labels/heuristics.py:35-74`
  * — positives = mentions linking entities that are category/type
  * descendants of the listing's subject type; negatives = mentions whose
  * entity carries a DISJOINT type; everything else abstains).
  *
  * Fully relational: two broadcast joins against taxonomy-sized tables.
  */
object WeakLabels {

  /** linkedMentions(mention_id, ent, listing_type) × entityTypes(ent, tpe)
    * with closureSelf(node, anc) and disjointPairs(type_a, type_b) →
    * (mention_id, weak_label ∈ {positive, negative, abstain}). */
  def label(linkedMentions: DataFrame, entityTypes: DataFrame,
            closureSelf: DataFrame, disjointPairs: DataFrame): DataFrame = {
    val entAnc = entityTypes
      .join(broadcast(closureSelf), entityTypes("tpe") === closureSelf("node"))
      .select(col("ent"), col("anc")).distinct()
    // positive: entity has the listing type among its ancestors-or-self
    val positives = linkedMentions
      .join(entAnc, linkedMentions("ent") === entAnc("ent") &&
                    linkedMentions("listing_type") === entAnc("anc"))
      .select(linkedMentions("mention_id")).distinct()
      .withColumn("weak_label", lit("positive"))
    // negative: some ancestor of the entity is disjoint with the listing type
    val negatives = linkedMentions
      .join(entAnc, linkedMentions("ent") === entAnc("ent"))
      .join(broadcast(disjointPairs),
            col("anc") === col("type_a") &&
            linkedMentions("listing_type") === col("type_b"))
      .select(linkedMentions("mention_id")).distinct()
      .join(positives.select("mention_id"), Seq("mention_id"), "left_anti")
      .withColumn("weak_label", lit("negative"))
    val decided = positives.unionByName(negatives)
    linkedMentions.select("mention_id").distinct()
      .join(decided, Seq("mention_id"), "left_outer")
      .na.fill("abstain", Seq("weak_label"))
  }
}
