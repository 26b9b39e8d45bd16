package graft.taxonomy

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ontology heuristics induced from instance data (A10-A12; reference:
  * `/root/reference/impl/dbpedia/heuristics.py`):
  *  - domain/range: per predicate, the argmax subject/object type share
  *    above a threshold (0.96 / 0.77, heuristics.py:12-62)
  *  - functional predicates: >=95% of subjects have exactly one object
  *    (heuristics.py:168-184)
  *  - disjointness: type pairs whose TF-IDF-weighted property vectors have
  *    cosine <= threshold (0.132, heuristics.py:80-160)
  *
  * All inputs are (KG-sized × taxonomy-sized) joins + two-level aggregates;
  * the pairwise cosine runs over |types|² which is taxonomy-scale (~10^3),
  * never corpus-scale.
  */
object Induction {

  /** relations(sub, pred, obj) × types(ent, tpe) → (pred, domain, share). */
  def domains(relations: DataFrame, types: DataFrame,
              threshold: Double = 0.96): DataFrame =
    argmaxTypeShare(
      relations.select(col("pred"), col("sub").as("ent")), types, threshold)
      .withColumnRenamed("tpe", "domain")

  /** Same on the object side (object-valued predicates only). */
  def ranges(relations: DataFrame, types: DataFrame,
             threshold: Double = 0.77): DataFrame =
    argmaxTypeShare(
      relations.select(col("pred"), col("obj").as("ent")), types, threshold)
      .withColumnRenamed("tpe", "range")

  private def argmaxTypeShare(predEnt: DataFrame, types: DataFrame,
                              threshold: Double): DataFrame = {
    val typed = predEnt.join(types, "ent")
    val totals = typed.groupBy("pred").agg(countDistinct("ent").as("total"))
    val cnts = typed.groupBy("pred", "tpe").agg(countDistinct("ent").as("cnt"))
    val w = Window.partitionBy("pred")
      .orderBy(col("cnt").desc, col("tpe").asc)
    cnts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(totals, "pred")
      .withColumn("share", col("cnt") / col("total"))
      .filter(col("share") >= threshold)
      .select(col("pred"), col("tpe"), round(col("share"), 6).as("share"))
  }

  /** Predicates where the share of subjects with >1 object is <= 1-threshold. */
  def functionalPredicates(relations: DataFrame,
                           threshold: Double = 0.95): DataFrame =
    relations.groupBy("pred", "sub").agg(count(lit(1)).as("cnt"))
      .groupBy("pred")
      .agg(avg(when(col("cnt") > 1, 1.0).otherwise(0.0)).as("multi_share"))
      .filter(col("multi_share") <= 1.0 - threshold)
      .select(col("pred"), round(lit(1.0) - col("multi_share"), 6)
                .as("functional_share"))

  /** Disjoint type pairs by property-vector cosine (TF-IDF weighting:
    * tf = P(pred|type), idf = log(|types| / df(pred))). Symmetric output
    * (a < b once). */
  def disjointness(relations: DataFrame, types: DataFrame,
                   threshold: Double = 0.132): DataFrame = {
    val typePred = relations.select(col("sub").as("ent"), col("pred"))
      .join(types, "ent")
      .groupBy("tpe", "pred").agg(count(lit(1)).as("cnt"))
    val nTypes = types.select("tpe").distinct().count()
    val df = typePred.groupBy("pred")
      .agg(countDistinct("tpe").as("df"))
    val tf = typePred.withColumn("total",
      sum("cnt").over(Window.partitionBy("tpe")))
      .withColumn("tf", col("cnt") / col("total"))
    val weights = tf.join(broadcast(df), "pred")
      .withColumn("w", col("tf") * log(lit(nTypes.toDouble) / col("df")))
      .select("tpe", "pred", "w")
    val norms = weights.groupBy("tpe")
      .agg(sqrt(sum(col("w") * col("w"))).as("norm"))
    val a = weights.select(col("tpe").as("ta"), col("pred"), col("w").as("wa"))
    val b = weights.select(col("tpe").as("tb"), col("pred"), col("w").as("wb"))
    val dots = a.join(b, Seq("pred")).filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(sum(col("wa") * col("wb")).as("dot"))
    // pairs sharing NO predicate have dot 0 → cosine 0 → disjoint; generate
    // the full pair set from the type list and left-join the dots
    val allTypes = types.select("tpe").distinct()
    val allPairs = allTypes.select(col("tpe").as("ta"))
      .crossJoin(allTypes.select(col("tpe").as("tb")))
      .filter(col("ta") < col("tb"))
    allPairs
      .join(dots, Seq("ta", "tb"), "left_outer")
      .na.fill(0.0, Seq("dot"))
      .join(norms.select(col("tpe").as("ta"), col("norm").as("na")), "ta")
      .join(norms.select(col("tpe").as("tb"), col("norm").as("nb")), "tb")
      .withColumn("cos", col("dot") / (col("na") * col("nb")))
      .filter(col("cos") <= threshold)
      .select(col("ta"), col("tb"), round(col("cos"), 6).as("cos"))
  }
}
