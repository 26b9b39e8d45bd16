package graft.mine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ZeroPaddedMedian

/** Cat2Ax-style axiom induction over "category sets" (groups of categories
  * sharing a lexical pattern) — the reference's pattern-mining core
  * (`/root/reference/impl/category/cat2ax.py:100-139,204-225`, category
  * sets at `/root/reference/impl/category/category_set.py:45-72`),
  * re-expressed as DataFrame aggregation with the exact zero-padded median.
  *
  * Inputs:
  *  - `catSets(set_id, cat_id)`: which categories form each pattern set
  *  - `memberFreqs(cat_id, value, freq)`: per category, the relative
  *    frequency of each candidate value (a type or a (pred,obj) pair
  *    encoded as a string) over the category's member entities
  *
  * Per (set, value): median of the member categories' freqs, ZERO-PADDED to
  * the set size (a category where the value never occurs contributes 0 —
  * omitting it is the classic over-confidence bug, SURVEY §7.5 #2).
  * The set's axiom = argmax-median value above `minMedian`, tie-broken
  * deterministically (median desc, value asc).
  *
  * Shuffle shape: one groupBy per level; the aggregator's merge is
  * associative so map-side partial aggregation applies. Category sets are
  * taxonomy-scale (≤10^6 rows) — every join here broadcasts at scale.
  */
object Cat2Ax {

  /** Per-(set, value) zero-padded median frequencies. */
  def setMedians(catSets: DataFrame, memberFreqs: DataFrame): DataFrame = {
    val sizes = catSets.groupBy("set_id")
      .agg(countDistinct("cat_id").as("set_size"))
    catSets
      .join(memberFreqs, "cat_id")
      .join(broadcast(sizes), "set_id")
      .groupBy("set_id", "value")
      .agg(ZeroPaddedMedian.column(col("freq"), col("set_size"))
             .as("median_freq"),
           count(lit(1)).as("support"),
           first("set_size").as("set_size"))
  }

  /** Best axiom per set above the confidence floor (≙ cat2ax.py argmax at
    * 213-225; `conf` = support share over the set). */
  def mineAxioms(catSets: DataFrame, memberFreqs: DataFrame,
                 minMedian: Double = 0.5): DataFrame = {
    val med = setMedians(catSets, memberFreqs)
    val w = Window.partitionBy("set_id")
      .orderBy(col("median_freq").desc, col("value").asc)
    med.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("median_freq") >= minMedian)
      .select(col("set_id"), col("value"),
              round(col("median_freq"), 6).as("median_freq"),
              round(col("support") / col("set_size"), 6).as("conf"))
  }
}
