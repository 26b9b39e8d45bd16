package graft.taxonomy

/** Driver-side taxonomy graph surgery (G1, G3-G7; SURVEY §7.5 #6).
  *
  * The reference performs these as networkx mutations over the (small)
  * class hierarchy (`/root/reference/impl/util/hierarchy_graph.py`,
  * `impl/util/base_graph.py`). Taxonomies are ~10^5-10^6 nodes — driver
  * scale by three orders of magnitude — so the idiomatic Spark design is:
  * collect the edge list, run these pure functions on the driver, and
  * checkpoint the result back as a table (exactly what the reference's
  * singleton stores amount to). Document-scale graphs (mention clusters)
  * NEVER come here — they go through [[graft.canonical.ConnectedComponents]].
  *
  * All functions are pure (immutable in/out) and deterministically
  * tie-broken, so results are independent of input ordering.
  */
object GraphOps {

  type Edge = (String, String) // (parent, child)

  /** G1: topological order (parents before children), deterministic
    * (lexicographic among ready nodes). Requires a DAG. */
  def topoOrder(edges: Seq[Edge]): Seq[String] = {
    val children = edges.groupMap(_._1)(_._2)
    val indeg = scala.collection.mutable.Map[String, Int]()
      .withDefaultValue(0)
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    edges.foreach { case (_, c) => indeg(c) += 1 }
    val ready = scala.collection.mutable.SortedSet[String]()
    nodes.filter(indeg(_) == 0).foreach(ready += _)
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (ready.nonEmpty) {
      val n = ready.head; ready -= n; out += n
      children.getOrElse(n, Nil).foreach { c =>
        indeg(c) -= 1; if (indeg(c) == 0) ready += c
      }
    }
    require(out.size == nodes.size, "cycle detected in topoOrder")
    out.toSeq
  }

  /** BFS depth from the root set (nodes without parents; isolated cycles
    * get their lexicographically smallest node as a surrogate root) —
    * computed on the FULL graph, cycles included, so back-edges show up as
    * deeper→shallower. */
  private def bfsDepths(edges: Seq[Edge]): Map[String, Int] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = edges.groupMap(_._1)(_._2)
    val hasIn = edges.map(_._2).toSet
    val d = scala.collection.mutable.Map[String, Int]()
    var depth = 0
    var frontier = nodes.filterNot(hasIn).sorted
    while (d.size < nodes.size) {
      if (frontier.isEmpty) { // an unreached (isolated) cycle component
        frontier = Seq(nodes.filterNot(d.contains).min)
        depth = 0
      }
      frontier.foreach(n => if (!d.contains(n)) d(n) = depth)
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .distinct.filterNot(d.contains).sorted
      depth += 1
    }
    d.toMap
  }

  /** G3: cycle resolution — repeatedly find a cycle and drop its
    * deepest-parent→shallowest-child edge (≙ the reference's remove-edge-
    * from-deeper-to-shallower policy, `hierarchy_graph.py:133-151`),
    * depths by BFS from the roots on the full graph; lexical tie-break. */
  def removeCycles(edges: Seq[Edge]): Seq[Edge] = {
    var es = edges.distinct
    var cycle = findCycle(es)
    while (cycle.nonEmpty) {
      val d = bfsDepths(es).withDefaultValue(0)
      val drop = cycle.get.maxBy { case (p, c) =>
        (d(p) - d(c), p, c) // deepest back-edge, lexical tie-break
      }
      es = es.filterNot(_ == drop)
      cycle = findCycle(es)
    }
    es
  }

  /** One directed cycle (as its edge list), if any. */
  private def findCycle(edges: Seq[Edge]): Option[Seq[Edge]] = {
    val adj = edges.groupMap(_._1)(_._2)
    val color = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val stack = scala.collection.mutable.ArrayBuffer[String]()
    var found: Option[Seq[Edge]] = None
    def dfs(n: String): Unit = {
      if (found.nonEmpty) return
      color(n) = 1; stack += n
      adj.getOrElse(n, Nil).sorted.foreach { c =>
        if (found.isEmpty) {
          if (color(c) == 1) {
            val cyc = stack.drop(stack.indexOf(c)) :+ c
            found = Some(cyc.sliding(2).map(p => (p(0), p(1))).toSeq)
          } else if (color(c) == 0) dfs(c)
        }
      }
      color(n) = 2; stack.remove(stack.size - 1)
    }
    edges.map(_._1).distinct.sorted.foreach(n => if (color(n) == 0) dfs(n))
    found
  }

  /** G4/U4: transitive reduction — drop edge (p, c) when c is reachable
    * from p via a longer path (`hierarchy_graph.py:252-255`). */
  def transitiveReduction(edges: Seq[Edge]): Seq[Edge] = {
    val adj = edges.groupMap(_._1)(_._2)
    def reachable(from: String, avoid: Edge): Set[String] = {
      val seen = scala.collection.mutable.Set[String]()
      def go(n: String): Unit = adj.getOrElse(n, Nil).foreach { c =>
        if ((n, c) != avoid && !seen(c)) { seen += c; go(c) }
      }
      go(from); seen.toSet
    }
    edges.filterNot { case e @ (p, c) => reachable(p, e).contains(c) }
  }

  /** G5: merge nodes sharing a canonical label: all nodes mapping to the
    * same key collapse into the lexicographically smallest member; edges
    * are rewired, self-loops dropped. Returns (edges, merged: node→survivor). */
  def mergeByLabel(edges: Seq[Edge],
                   canonical: String => String): (Seq[Edge], Map[String, String]) = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val survivor = nodes.groupBy(canonical).values
      .flatMap { group =>
        val s = group.min
        group.map(_ -> s)
      }.toMap
    val rewired = edges
      .map { case (p, c) => (survivor(p), survivor(c)) }
      .filter { case (p, c) => p != c }
      .distinct
    (rewired, survivor.filter { case (n, s) => n != s })
  }

  /** G6: attach orphan nodes (no parent) to the best lexical-head match
    * among candidate parents, else to `root` (`hierarchy_graph.py:64-131`).
    * headKey: node → its head lemma; candidates keyed by the same. */
  def appendUnconnected(edges: Seq[Edge], allNodes: Seq[String],
                        root: String,
                        headKey: String => String): Seq[Edge] = {
    val hasParent = edges.map(_._2).toSet
    val orphans = allNodes.filterNot(hasParent).filterNot(_ == root).sorted
    val byHead = allNodes.filter(hasParent)
      .groupBy(headKey).view.mapValues(_.min).toMap
    edges ++ orphans.map { o =>
      val parent = byHead.get(headKey(o)).filterNot(_ == o).getOrElse(root)
      (parent, o)
    }
  }

  /** G7/N12: keep parent→child edges only when the head lemmas are
    * hypernym-related per the supplied relation (e.g. Hearst counts or a
    * WordNet-style set) — `hierarchy_graph.py:155-165`. */
  def filterEdgesByHypernymy(edges: Seq[Edge], headKey: String => String,
                             isHypernym: (String, String) => Boolean): Seq[Edge] =
    edges.filter { case (p, c) =>
      val hp = headKey(p); val hc = headKey(c)
      hp == hc || isHypernym(hc, hp)
    }
}
