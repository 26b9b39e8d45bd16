package graft.taxonomy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Disjointness guard for mined type assertions (U3/U5; reference:
  * disjointness-aware type merge `/root/reference/impl/caligraph/entity.py:162-188`
  * over pairs induced at `/root/reference/impl/dbpedia/heuristics.py:80-160`).
  *
  * A candidate (ent, tpe) is dropped when ANY ancestor-or-self of `tpe` is
  * declared disjoint with ANY ancestor-or-self of one of the entity's seed
  * types. All inputs except the candidates are taxonomy-sized → broadcast.
  */
object Disjointness {

  /** closureWithSelf(node, anc): transitive ancestors INCLUDING the node
    * itself — the shape both the guard and transitive typing need. */
  def closureWithSelf(taxonomyEdges: DataFrame,
                      report: graft.runtime.LoopReport = null): DataFrame = {
    val edges = taxonomyEdges.select(col("child").as("node"),
                                     col("parent").as("anc"))
    val closure = Closure.transitiveClosure(edges, report)
    val selfPairs = taxonomyEdges.select(col("child").as("node"))
      .unionByName(taxonomyEdges.select(col("parent").as("node")))
      .distinct()
      .withColumn("anc", col("node"))
    closure.unionByName(selfPairs).distinct()
  }

  /** candidates(ent, tpe) minus disjointness conflicts vs seedTypes. */
  def filterCandidates(candidates: DataFrame, seedTypes: DataFrame,
                       closureSelf: DataFrame,
                       disjointPairs: DataFrame): DataFrame = {
    val entAnc = seedTypes
      .join(broadcast(closureSelf), seedTypes("tpe") === closureSelf("node"))
      .select(col("ent"), col("anc").as("ent_anc")).distinct()
    val candAnc = candidates
      .join(broadcast(closureSelf), candidates("tpe") === closureSelf("node"))
      .select(col("ent"), col("tpe"), col("anc").as("cand_anc"))
    val bad = candAnc
      .join(entAnc, "ent")
      .join(broadcast(disjointPairs),
            col("cand_anc") === col("type_a") && col("ent_anc") === col("type_b"))
      .select("ent", "tpe").distinct()
    candidates.join(bad, Seq("ent", "tpe"), "left_anti")
  }
}
