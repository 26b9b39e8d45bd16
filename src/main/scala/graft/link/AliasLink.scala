package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Normalize

/** Entity linking against a broadcast alias dictionary with SALTED
  * repartitioning for head-entity skew (the north rule's explicit skew
  * requirement).
  *
  * Reference analogue: surface-form probe
  * `/root/reference/impl/dbpedia/resource.py:180-194` +
  * `/root/reference/impl/category/cat2ax.py:148-161`; best-candidate argmax
  * ≙ `/root/reference/impl/subject_entity/entity_disambiguation/matching/crossencoder.py:92-97` (W2).
  *
  * Skew story at 10^12 docs: a handful of alias keys ("usa"-class heads)
  * carry orders of magnitude more mentions than the median key. A plain
  * equi-join keyed on the alias would put every "usa" mention in one task.
  * Here the dictionary side is broadcast (no shuffle of the corpus at all),
  * and the downstream per-key aggregations never group by raw key alone —
  * the hot-key path salts the mention side with pmod(xxhash64(mention_id), S)
  * and replicates the (tiny) hot slice of the dictionary S ways, so even a
  * shuffle-hash fallback plan (when the dict outgrows the broadcast
  * threshold) stays balanced. Results are provably identical to the unsalted
  * join — the salt is derived from the row id, never from data order.
  */
object AliasLink {

  val Salt = 8

  /** aliases(alias, ent, freq, is_hot) → dictionary keyed by normalized
    * alias key (the codegen'd native expression). */
  def buildDict(aliases: DataFrame): DataFrame =
    aliases.select(Normalize.aliasKey(col("alias")).as("key"),
                   col("ent"), col("freq"), col("is_hot"))

  /** mentions(..., label) × dict → linked(..., ent) + unlinked(..., key).
    * Returns (linked, unlinked). */
  def link(mentions: DataFrame, dict: DataFrame): (DataFrame, DataFrame) = {
    val keyed = mentions.withColumn("key", Normalize.aliasKey(col("label")))

    val hotDict = dict.filter(col("is_hot"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    val coldDict = dict.filter(!col("is_hot"))

    val salted = keyed.withColumn("salt",
      pmod(xxhash64(col("mention_id")), lit(Salt)).cast("int"))

    val hotJoined = salted
      .join(broadcast(hotDict), Seq("key", "salt"))
    val coldJoined = keyed
      .join(broadcast(coldDict.drop("is_hot")), Seq("key"))

    val candidates = hotJoined.drop("salt", "is_hot")
      .unionByName(coldJoined)

    // W2: best candidate per mention — deterministic total order
    val w = Window.partitionBy("mention_id")
      .orderBy(col("freq").desc, col("ent").asc)
    val linked = candidates
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("url", "listing_key", "item_idx", "mention_id", "label",
              "key", "ent")

    val unlinked = keyed.join(linked.select("mention_id"),
                              Seq("mention_id"), "left_anti")
      .select("url", "listing_key", "item_idx", "mention_id", "label", "key")

    (linked, unlinked)
  }
}
