package graft.taxonomy

import graft.core.Normalize

/** G8: the ORCHESTRATED taxonomy merge — one function composing the
  * reference's graph-construction sequence over a (driver-scale) edge
  * list, in the reference's order:
  *
  *  1. conceptual filter — drop non-conceptual nodes (plural lexhead test,
  *     `category/graph.py:62-71` make_conceptual) and re-attach orphaned
  *     survivors (`hierarchy_graph.py:64` append_unconnected);
  *  2. node merge by canonical label (`hierarchy_graph.py:183` merge_nodes);
  *  3. cycle resolution (`hierarchy_graph.py:133` _resolve_cycles);
  *  4. unrelated-edge removal by head-lemma hypernymy
  *     (`hierarchy_graph.py:155` remove_unrelated_edges) + re-attach;
  *  5. transitive reduction (`hierarchy_graph.py:252`);
  *  6. final append-unconnected.
  *
  * All steps are the already-tested [[GraphOps]] primitives; this is the
  * single-entry composition the reference runs as CategoryGraph →
  * CaliGraph construction. Driver-side by design: taxonomies are ≤10^6
  * edges (SURVEY §7.5 #6); corpus-scale graphs go through
  * [[graft.canonical.ConnectedComponents]], never here.
  */
object TaxonomyMerge {

  case class Result(edges: Seq[(String, String)],
                    merged: Map[String, String],
                    dropped: Set[String])

  /** Plural-lexhead conceptual test (F5, the same native predicate
    * `Categories.conceptual` uses): every trailing connector-joined
    * subject is plural. */
  def isConceptual(label: String): Boolean =
    Normalize.hasPluralLexheadSubjectsJava(label)

  /** edges = (parent, child); labels = node → display label; isHypernym =
    * (childHeadLemma, parentHeadLemma) relation (e.g. Hearst-count lookup). */
  def merge(edges: Seq[(String, String)], labels: Map[String, String],
            root: String,
            isHypernym: (String, String) => Boolean = (_, _) => true)
      : Result = {
    def labelOf(n: String) = labels.getOrElse(n, n)
    // head info is pure in the label — memoized per node for the repeated
    // append/filter passes below
    val infoCache = scala.collection.mutable.Map.empty[String, Normalize.HeadInfo]
    def headInfo(n: String): Normalize.HeadInfo =
      infoCache.getOrElseUpdate(n, Normalize.headInfoJava(labelOf(n)))
    def subjectsOf(n: String): Set[String] = headInfo(n).subjects

    // 1. conceptual filter + re-attach
    val allNodes = (edges.flatMap(e => Seq(e._1, e._2)) :+ root).distinct
    val kept = allNodes.filter(n => n == root || isConceptual(labelOf(n)))
    val keptSet = kept.toSet
    val dropped = allNodes.filterNot(keptSet).toSet
    val conceptualEdges = edges.filter(e => keptSet(e._1) && keptSet(e._2))
    val attached = GraphOps.appendUnconnected(conceptualEdges, kept, root,
                                              headInfo)

    // 2. merge by canonical label
    val (mergedEdges, merged) = GraphOps.mergeByLabel(attached,
      n => Normalize.canonicalLabelJava(labelOf(n)).toLowerCase(java.util.Locale.ROOT))

    // 3. cycle resolution
    val acyclic = GraphOps.removeCycles(mergedEdges)

    // 4. hypernymy edge filter + re-attach
    val related = GraphOps.filterEdgesByHypernymy(acyclic, subjectsOf,
                                                  isHypernym)
    val mergedNodes = (acyclic.flatMap(e => Seq(e._1, e._2)) :+ root).distinct
    val reattached = GraphOps.appendUnconnected(related, mergedNodes, root,
                                                headInfo)

    // 5. transitive reduction, 6. final append
    val reduced = GraphOps.transitiveReduction(reattached)
    val finalNodes = (reduced.flatMap(e => Seq(e._1, e._2)) :+ root).distinct
    Result(GraphOps.appendUnconnected(reduced, finalNodes, root, headInfo)
             .distinct,
           merged, dropped)
  }
}
