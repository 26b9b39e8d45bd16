package graft.canonical

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** NIL-entity canonicalization: cluster unlinked mentions into new entities
  * via connected components over the mention↔alias-key bipartite graph, then
  * derive CONTENT-BASED new-entity ids ("new:<key>").
  *
  * Reference analogue: NastyLinker clustering
  * `/root/reference/impl/subject_entity/entity_disambiguation/matching/greedy_clustering.py:37-77`
  * + sequential NIL id allocation `entity_disambiguation/__init__.py:26-33`.
  * The reference's counter-based ids are execution-order-DEPENDENT; ours are
  * derived from the component's alias key, so any partitioning/parallelism
  * yields the same ids (SURVEY.md §7.5 hard-problem #3).
  */
object NilCluster {

  /** unlinked(mention_id, key, ...) → assignments(mention_id, ent).
    *
    * Every mention node carries exactly ONE key edge, so a component never
    * spans beyond its key — which makes the assignment PAGE-LOCAL: clustering
    * any url-slice of the input yields the same (mention_id, ent) rows as
    * clustering the whole corpus (the property [[graft.Pipeline.runDelta]]'s
    * subjects maintenance relies on). */
  def cluster(unlinked: DataFrame,
              report: graft.runtime.LoopReport = null): DataFrame = {
    val edges = unlinked.select(
      concat(lit("m:"), col("mention_id")).as("src"),
      concat(lit("k:"), col("key")).as("dst"))
    val cc = ConnectedComponents.run(edges, report)
    val keyNodes = cc.filter(col("node").startsWith("k:"))
      .select(col("component"),
              concat(lit("new:"), expr("substring(node, 3)")).as("ent"))
    cc.filter(col("node").startsWith("m:"))
      .select(expr("substring(node, 3)").as("mention_id"), col("component"))
      .join(keyNodes, "component")
      .select("mention_id", "ent")
  }
}
