package graft.emit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sunburst type-distribution artifact (≙ `/root/reference/impl/
  * caligraph/serialize.py:306-344` _serialize_type_distribution): one
  * representative type per entity, counted up the taxonomy, then a
  * threshold-pruned nested JSON tree for visualization.
  *
  * Two documented substitutions: (1) the reference picks the representative
  * type with `random.choice` — this engine picks DETERMINISTICALLY (the
  * xxhash64(ent)-indexed element of the entity's sorted type list), so runs
  * are reproducible and partition-invariant; (2) leaf weights round half-up
  * (`math.round`) where Python's `round` banker-rounds exact halves.
  *
  * Scale shape: the per-entity choice and the ancestor rollup are
  * distributed (one window keyed by ent over the candidate-sized type
  * table, one broadcast closure join + count); only the TAXONOMY-sized
  * count table is collected for the tree build — the same driver-side
  * discipline as [[graft.taxonomy.GraphOps.topoOrder]].
  */
object TypeDistribution {

  /** One representative type per entity (≙ `random.choice(ent_types)`,
    * serialize.py:311, made deterministic). Input: (ent, tpe) DIRECT types. */
  def chosenTypes(entTypes: DataFrame): DataFrame = {
    val byEnt = Window.partitionBy("ent")
    entTypes.select("ent", "tpe").distinct()
      .withColumn("rn", row_number().over(byEnt.orderBy("tpe")))
      .withColumn("n", count(lit(1)).over(byEnt))
      .filter(col("rn") - 1 === pmod(xxhash64(col("ent")), col("n")))
      .select("ent", "tpe")
  }

  /** Per-type counts: each entity's chosen type increments the type and
    * every transitive supertype, include_self (serialize.py:312-314).
    * `closureSelf`: (node, anc) WITH self pairs
    * ([[graft.taxonomy.Disjointness.closureWithSelf]]). */
  def typeCounts(entTypes: DataFrame, closureSelf: DataFrame): DataFrame =
    chosenTypes(entTypes)
      .join(broadcast(closureSelf), col("tpe") === col("node"))
      .groupBy(col("anc").as("tpe")).agg(count(lit(1)).as("cnt"))

  private sealed trait Out
  private case class OutLeaf(name: String, value: Long) extends Out
  private case class OutNode(name: String, children: Seq[Out]) extends Out

  /** The normalized sunburst JSON (serialize.py:306-344). `entTypes`:
    * (ent, tpe) direct types; `edges`: (child, parent) taxonomy (a DAG —
    * cycle resolution runs upstream, G3); `root`: the tree root's type id
    * (≙ `clgo.get_type_root()`). Diamond children appear under every
    * parent, exactly like the reference's subtype recursion. */
  def sunburst(entTypes: DataFrame, edges: DataFrame, root: String): String =
    sunburst(entTypes, edges, root,
             graft.taxonomy.Disjointness.closureWithSelf(edges))

  /** As above, with the transitive closure PASSED IN — the pipeline's emit
    * stage already holds closureSelf (it feeds typing, axiom facts, and
    * typeCounts), so deriving it again here would re-run the iterative
    * closure job once per artifact. */
  def sunburst(entTypes: DataFrame, edges: DataFrame, root: String,
               closureSelf: DataFrame): String = {
    // taxonomy-sized collects, by design (scaladoc)
    val counts: Map[String, Long] = typeCounts(entTypes, closureSelf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val children: Map[String, Seq[String]] = edges
      .select("child", "parent").distinct().collect()
      .map(r => (r.getString(1), r.getString(0)))
      .groupMap(_._1)(_._2).view.mapValues(_.sorted.toSeq).toMap

    // ≙ _create_type_distribution (serialize.py:322-328)
    case class Node(name: String, value: Long, kids: Seq[Node])
    def build(t: String): Node =
      Node(t, counts.getOrElse(t, 0L),
           children.getOrElse(t, Nil).map(build))

    // ≙ _normalize_type_distribution (serialize.py:330-344)
    def normalize(n: Node, nodeWeight: Double, level: Int): Out = {
      if (n.kids.isEmpty) OutLeaf(n.name, math.round(nodeWeight))
      else {
        val remainderName = if (level == 0) "..." else "-other-"
        val threshold =
          if (level > 3) 0.15 else if (level > 0) 0.1 else 0.005
        val nodeValue = math.max(n.value, n.kids.map(_.value).sum)
        val valid = n.kids.filter(c =>
          c.value > 0 && nodeValue > 0 &&
            c.value.toDouble / nodeValue > threshold)
        val remaining = nodeValue - valid.map(_.value).sum
        val all =
          if (remaining > 0) valid :+ Node(remainderName, remaining, Nil)
          else valid
        OutNode(n.name, all.map(c =>
          normalize(c, nodeWeight * c.value / nodeValue, level + 1)))
      }
    }

    val tree = build(root)
    render(normalize(tree, tree.value.toDouble, 0))
  }

  private def esc(s: String): String = {
    val b = new StringBuilder
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case c if c < ' '  => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.toString
  }

  private def render(o: Out): String = o match {
    case OutLeaf(n, v)    => s"""{"name": "${esc(n)}", "value": $v}"""
    case OutNode(n, kids) =>
      s"""{"name": "${esc(n)}", "children": [${
        kids.map(render).mkString(", ")}]}"""
  }
}
