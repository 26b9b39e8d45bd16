package graft.taxonomy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A15: per-class property frequencies with a transitive-subtree fallback
  * for sparse classes (reference:
  * `/root/reference/impl/caligraph/entity.py:330-352` — classes with fewer
  * than `minEntities` direct instances accumulate their descendants').
  *
  * Shape: one groupBy over (type, pred) for the direct counts, then one
  * closure join + re-aggregation for the sparse classes only — the subtree
  * rollup never touches classes that are already dense. */
object PropertyFrequencies {

  /** entityTypes(ent, tpe), relations(sub, pred, obj),
    * closureSelf(node, anc) → (tpe, pred, freq, n_entities, via_subtree). */
  def perClass(entityTypes: DataFrame, relations: DataFrame,
               closureSelf: DataFrame, minEntities: Long = 5): DataFrame = {
    val entPreds = relations.select(col("sub").as("ent"), col("pred"))
    def freqs(types: DataFrame) = {
      val sizes = types.groupBy("tpe")
        .agg(countDistinct("ent").as("n_entities"))
      types.join(entPreds, "ent")
        .groupBy("tpe", "pred").agg(countDistinct("ent").as("cnt"))
        .join(sizes, "tpe")
        .withColumn("freq", round(col("cnt") / col("n_entities"), 6))
        .select("tpe", "pred", "freq", "n_entities")
    }
    val direct = freqs(entityTypes)
    val dense = direct.filter(col("n_entities") >= minEntities)
      .withColumn("via_subtree", lit(false))
    val sparseTypes = direct.select("tpe", "n_entities").distinct()
      .filter(col("n_entities") < minEntities).select("tpe")
    // subtree rollup: every entity of a descendant type counts for the
    // sparse ancestor
    val subtreeTypes = entityTypes
      .join(broadcast(closureSelf), entityTypes("tpe") === closureSelf("node"))
      .select(col("ent"), col("anc").as("tpe"))
      .join(broadcast(sparseTypes), Seq("tpe"))
    val sparse = freqs(subtreeTypes).withColumn("via_subtree", lit(true))
    dense.unionByName(sparse)
  }
}
