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
    * among connected candidates, else to `root` — the faithful
    * find_parents_by_headlemma_match (`hierarchy_graph.py:85-131`):
    *
    *  1. candidates = connected nodes sharing a SUBJECT lemma (LHS) with
    *     the orphan AND an equal non-head part (NH) — minus the orphan's
    *     own descendants (the reference subtracts them to stay acyclic);
    *  2. drop candidates whose head-span remainder (LH) carries lemmas the
    *     orphan lacks ("Science fiction writers" can never parent "Fiction
    *     writers"); rank the rest by remainder overlap, keep ALL argmax
    *     winners (>0), else the most generic (empty-remainder) candidates;
    *  3. when step 2 is empty and the orphan HAS a non-head part, retry
    *     with NH-free candidates (`:111-114`);
    *  4. still nothing → the root.
    *
    * Orphan mapping is computed against the ORIGINAL edge set (the
    * reference builds the full node→parents dict first, then adds edges),
    * so one orphan never becomes another's parent within the pass. */
  def appendUnconnected(edges: Seq[Edge], allNodes: Seq[String],
                        root: String,
                        info: String => graft.core.Normalize.HeadInfo): Seq[Edge] = {
    val hasParent = edges.map(_._2).toSet
    val orphans = allNodes.filterNot(hasParent).filterNot(_ == root).sorted
    val connected = allNodes.filter(n => hasParent(n) && n != root)
    val infoOf = allNodes.map(n => n -> info(n)).toMap
    val byLemma: Map[String, Seq[String]] = connected
      .flatMap(n => infoOf(n).subjects.toSeq.map(_ -> n))
      .groupMap(_._1)(_._2)
    val adj = edges.groupMap(_._1)(_._2)
    def descendants(n: String): Set[String] = {
      val seen = scala.collection.mutable.Set[String]()
      def go(x: String): Unit = adj.getOrElse(x, Nil).foreach { c =>
        if (!seen(c)) { seen += c; go(c) }
      }
      go(n); seen.toSet
    }
    edges ++ orphans.flatMap { o =>
      val oi = infoOf(o)
      val desc = descendants(o)
      val cands = oi.subjects.toSeq.sorted
        .flatMap(l => byLemma.getOrElse(l, Nil))
        .distinct.filter(c => c != o && !desc(c))
      def pick(in: Seq[String]): Seq[String] = {
        val fitting = in.filter(c =>
          infoOf(c).remainder.subsetOf(oi.remainder))
        val scored = fitting.map(c =>
          c -> (infoOf(c).remainder & oi.remainder).size)
        val mx = scored.map(_._2).maxOption.getOrElse(0)
        if (mx > 0) scored.filter(_._2 == mx).map(_._1)
        else fitting.filter(c => infoOf(c).remainder.isEmpty)
      }
      val exact = pick(cands.filter(c => infoOf(c).nonHead == oi.nonHead))
      val best =
        if (exact.nonEmpty) exact
        else if (oi.nonHead.nonEmpty)
          pick(cands.filter(c => infoOf(c).nonHead.isEmpty))
        else Nil
      if (best.nonEmpty) best.sorted.map(p => (p, o))
      else Seq((root, o))
    }
  }

  /** G7/N12: keep parent→child edges only when SOME (parent subject lemma,
    * child subject lemma) pair is synonym- or hypernym-related —
    * `hierarchy_graph.py:155-165` _is_hierarchical_edge iterates the full
    * LHS × LHS cross product (the reference's is_hypernym treats equal
    * words as synonyms, hence the `pl == cl` arm). `isHypernym` keeps the
    * (childLemma, parentLemma) argument order used across this repo. */
  def filterEdgesByHypernymy(edges: Seq[Edge],
                             subjects: String => Set[String],
                             isHypernym: (String, String) => Boolean): Seq[Edge] =
    edges.filter { case (p, c) =>
      val ps = subjects(p); val cs = subjects(c)
      ps.exists(pl => cs.exists(cl => pl == cl || isHypernym(cl, pl)))
    }
}
