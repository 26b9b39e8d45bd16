package graft.emit

/** Clustering evaluation metrics for entity-disambiguation quality (A17;
  * reference: NMI/ARI/B³ family at
  * `/root/reference/impl/subject_entity/entity_disambiguation/evaluation.py:140-167`).
  * Driver-side over collected (itemId, predictedCluster, goldCluster)
  * samples — evaluation runs on gold subsets (10^3–10^5 rows), never the
  * corpus, exactly as in the reference. */
object ClusterMetrics {

  case class Scores(purity: Double, nmi: Double, ari: Double)

  def evaluate(assign: Seq[(String, String, String)]): Scores = {
    val n = assign.size.toDouble
    require(n > 0, "empty assignment")
    val joint = assign.groupBy(a => (a._2, a._3)).view.mapValues(_.size).toMap
    val pred = assign.groupBy(_._2).view.mapValues(_.size).toMap
    val gold = assign.groupBy(_._3).view.mapValues(_.size).toMap

    val purity = pred.keys.toSeq.map { k =>
      joint.collect { case ((p, _), c) if p == k => c }.max
    }.sum / n

    def h(counts: Iterable[Int]): Double =
      -counts.map(_ / n).filter(_ > 0).map(p => p * math.log(p)).sum
    val hP = h(pred.values)
    val hG = h(gold.values)
    val mi = joint.map { case ((p, g), c) =>
      val pij = c / n
      pij * math.log(pij / ((pred(p) / n) * (gold(g) / n)))
    }.sum
    val nmi = if (hP == 0 && hG == 0) 1.0
              else if (hP == 0 || hG == 0) 0.0
              else 2 * mi / (hP + hG)

    def c2(x: Long): Double = x * (x - 1) / 2.0
    val sumIj = joint.values.map(c => c2(c.toLong)).sum
    val sumA = pred.values.map(c => c2(c.toLong)).sum
    val sumB = gold.values.map(c => c2(c.toLong)).sum
    // n=1: c2(n)=0, expected would be 0/0 -> NaN. A single item is trivially
    // perfectly clustered; short-circuit to the defined degenerate value.
    val ari = if (c2(n.toLong) == 0.0) 1.0 else {
      val expected = sumA * sumB / c2(n.toLong)
      val maxIdx = (sumA + sumB) / 2.0
      if (maxIdx == expected) 1.0
      else (sumIj - expected) / (maxIdx - expected)
    }

    Scores(purity, nmi, ari)
  }
}
