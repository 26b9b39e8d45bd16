package graft.emit

/** Entity-disambiguation clustering metrics (A17 completion; reference:
  * `/root/reference/impl/subject_entity/entity_disambiguation/evaluation.py:33-55,122-167`):
  *
  *  - Hungarian NIL assignment: predicted NIL clusters are optimally mapped
  *    to gold "unknown" entities by maximizing linked-mention hits
  *    (evaluation.py:33-55, scipy linear_sum_assignment ≙ [[hungarian]]);
  *    assignments with zero supporting mentions are discarded (:51-53).
  *  - MUC (Vilain et al. 1995): link-based P/R/F1.
  *  - B³ (Bagga & Baldwin 1998): per-mention cluster-overlap P/R/F1.
  *  - B³+ : B³ where a mention only scores if its cluster's (assigned)
  *    entity equals the gold entity — the ED-aware variant the reference
  *    reports as 'B3+' (NASTyLinker evaluation).
  *  - CEAF-e (Luo 2005, φ4): optimal 1-1 cluster matching (Hungarian again),
  *    φ4(C,G) = 2|C∩G| / (|C|+|G|); P = Φ/#pred, R = Φ/#gold.
  *
  * Driver-side over gold samples (10^3–10^5 mentions), like the reference —
  * evaluation never touches the corpus.
  */
object EdMetrics {

  case class PRF(p: Double, r: Double, f1: Double)
  case class Cluster(mentions: Set[String], ent: Option[String])

  private def prf(p: Double, r: Double): PRF =
    PRF(p, r, if (p + r == 0) 0.0 else 2 * p * r / (p + r))

  /** Kuhn–Munkres minimum-cost assignment (potentials form, O(n²m)) for an
    * n×m cost matrix with n <= m; returns the matched column per row. */
  def hungarian(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    if (n == 0) return Array.empty
    val m = cost(0).length
    require(m >= n, s"hungarian needs rows<=cols, got ${n}x$m (pad first)")
    val INF = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1)
    val way = new Array[Int](m + 1)
    for (i <- 1 to n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(INF)
      val used = Array.fill(m + 1)(false)
      var done = false
      while (!done) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        var k = 0
        while (k <= m) {
          if (used(k)) { u(p(k)) += delta; v(k) -= delta }
          else minv(k) -= delta
          k += 1
        }
        j0 = j1
        done = p(j0) == 0
      }
      while (j0 != 0) { val j1 = way(j0); p(j0) = p(j1); j0 = j1 }
    }
    val ans = Array.fill(n)(-1)
    for (j <- 1 to m if p(j) != 0) ans(p(j) - 1) = j - 1
    ans
  }

  /** evaluation.py:33-55 — optimally assign gold UNKNOWN entities to the
    * predicted NIL clusters (clusters with ent=None); known-entity clusters
    * pass through. Zero-hit assignments are discarded. */
  def assignNilClusters(clusters: Seq[Cluster],
                        mentionToGold: Map[String, String],
                        knownEntities: Set[String]): Seq[Cluster] = {
    val (withEnt, nil) = clusters.partition(_.ent.isDefined)
    if (nil.isEmpty) return clusters
    val unknownEnts = mentionToGold.values.toSeq.distinct
      .filterNot(knownEntities).sorted
    if (unknownEnts.isEmpty) return clusters
    val entIdx = unknownEnts.zipWithIndex.toMap
    val counts = nil.map { c =>
      c.mentions.toSeq.flatMap(mentionToGold.get)
        .filterNot(knownEntities)
        .groupBy(identity).view.mapValues(_.size).toMap
    }
    // columns = unknown entities (+ zero-cost dummy cols when fewer than
    // clusters); cost = -hits (maximize hits)
    val m = math.max(unknownEnts.size, nil.size)
    val cost = counts.map { cnt =>
      Array.tabulate(m)(j =>
        if (j < unknownEnts.size) -cnt.getOrElse(unknownEnts(j), 0).toDouble
        else 0.0)
    }.toArray
    val assigned = hungarian(cost)
    val nilAssigned = nil.zipWithIndex.map { case (c, i) =>
      val j = assigned(i)
      val ent = if (j >= 0 && j < unknownEnts.size &&
                    counts(i).getOrElse(unknownEnts(j), 0) > 0)
        Some(unknownEnts(j))
      else None
      Cluster(c.mentions, ent)
    }
    withEnt ++ nilAssigned
  }

  /** Per-mention (predClusterIdx, goldEntity) pairs; mentions without a
    * gold mapping are ignored (evaluation.py:71-73). */
  private def pairs(clusters: Seq[Cluster],
                    mentionToGold: Map[String, String]): Seq[(Int, String)] =
    clusters.zipWithIndex.flatMap { case (c, i) =>
      c.mentions.toSeq.sorted.flatMap(m => mentionToGold.get(m).map((i, _)))
    }

  /** MUC (Vilain 1995): R = Σ_g (|g|−|partition of g by pred|)/Σ_g(|g|−1),
    * P symmetric with roles swapped. */
  def muc(clusters: Seq[Cluster],
          mentionToGold: Map[String, String]): PRF = {
    val ps = pairs(clusters, mentionToGold)
    def score(keyOf: ((Int, String)) => Any,
              otherOf: ((Int, String)) => Any): Double = {
      val groups = ps.groupBy(keyOf).values
      val num = groups.map(g => g.size - g.map(otherOf).distinct.size).sum
      val den = groups.map(_.size - 1).sum
      if (den == 0) 0.0 else num.toDouble / den
    }
    prf(score(_._1, _._2), score(_._2, _._1))
  }

  /** B³ (Bagga & Baldwin 1998). `plusEnt`: when true, a mention scores only
    * if its cluster's entity equals its gold entity (B³+). */
  def bCubed(clusters: Seq[Cluster], mentionToGold: Map[String, String],
             plusEnt: Boolean = false): PRF = {
    val ps = pairs(clusters, mentionToGold)
    if (ps.isEmpty) return PRF(0, 0, 0)
    val byPred = ps.groupBy(_._1).view.mapValues(_.size).toMap
    val byGold = ps.groupBy(_._2).view.mapValues(_.size).toMap
    val byBoth = ps.groupBy(identity).view.mapValues(_.size).toMap
    val scores = ps.map { case (ci, g) =>
      val ok = !plusEnt || clusters(ci).ent.contains(g)
      val inter = byBoth((ci, g)).toDouble
      (if (ok) inter / byPred(ci) else 0.0,
       if (ok) inter / byGold(g) else 0.0)
    }
    prf(scores.map(_._1).sum / ps.size, scores.map(_._2).sum / ps.size)
  }

  /** CEAF-e (Luo 2005) with φ4 similarity and Hungarian optimal matching. */
  def ceafE(clusters: Seq[Cluster],
            mentionToGold: Map[String, String]): PRF = {
    val ps = pairs(clusters, mentionToGold)
    if (ps.isEmpty) return PRF(0, 0, 0)
    val pred = ps.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val gold = ps.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val predKeys = pred.keys.toSeq.sorted
    val goldKeys = gold.keys.toSeq.sorted
    def phi4(ci: Int, g: String): Double = {
      val inter = byBothCount(ps, ci, g)
      2.0 * inter / (pred(ci).size + gold(g).size)
    }
    // maximize Σφ — Hungarian on negated φ; transpose when needed so
    // rows<=cols (Φ is symmetric under the transpose)
    val (rows, cols) =
      if (predKeys.size <= goldKeys.size)
        (predKeys.map(Left(_): Either[Int, String]),
         goldKeys.map(Right(_): Either[Int, String]))
      else
        (goldKeys.map(Right(_): Either[Int, String]),
         predKeys.map(Left(_): Either[Int, String]))
    val cost = rows.map { r =>
      cols.map { c =>
        val (ci, g) = (r, c) match {
          case (Left(i), Right(s))  => (i, s)
          case (Right(s), Left(i))  => (i, s)
          case _                    => throw new IllegalStateException
        }
        -phi4(ci, g)
      }.toArray
    }.toArray
    val matched = hungarian(cost)
    val phiSum = rows.indices.map { i =>
      val j = matched(i)
      if (j < 0) 0.0 else -cost(i)(j)
    }.sum
    prf(phiSum / predKeys.size, phiSum / goldKeys.size)
  }

  private def byBothCount(ps: Seq[(Int, String)], ci: Int,
                          g: String): Int =
    ps.count(p => p._1 == ci && p._2 == g)

  /** All metrics at once, with the Hungarian NIL assignment applied first
    * when `predictUnknowns` (≙ MetricsCalculator, evaluation.py:122-160). */
  def evaluate(clusters: Seq[Cluster], mentionToGold: Map[String, String],
               knownEntities: Set[String],
               predictUnknowns: Boolean = true): Map[String, PRF] = {
    val cs = if (predictUnknowns)
      assignNilClusters(clusters, mentionToGold, knownEntities)
    else clusters
    Map(
      "MUC" -> muc(cs, mentionToGold),
      "B3" -> bCubed(cs, mentionToGold),
      "B3+" -> bCubed(cs, mentionToGold, plusEnt = true),
      "CEAF" -> ceafE(cs, mentionToGold))
  }
}
