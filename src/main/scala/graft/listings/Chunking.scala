package graft.listings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Listing chunk packing for batched (transformer-style) inference (M1;
  * reference: `/root/reference/impl/subject_entity/mention_detection/data/chunking.py:13-18,91-142`
  * — <=300 tokens per chunk, 3..16 items per chunk, items truncated to 30
  * tokens, plus a per-listing context prefix).
  *
  * Packing is per LISTING (a page-local group, bounded size), so it is a
  * groupBy(listing) + pure pack function + explode — one shuffle keyed by
  * listing id, balanced by construction. The downstream inference stage
  * consumes chunks via mapPartitions with internal batching (the GPU
  * batch-500 analogue, ≙ mention_detection/__init__.py:14).
  */
object Chunking {

  val MaxChunkTokens = 300
  val MinItems = 3
  val MaxItems = 16
  val MaxItemTokens = 30

  case class Item(item_idx: Int, tokens: Seq[String])
  case class Chunk(chunk_idx: Int, item_idxs: Seq[Int], n_tokens: Int)

  /** Pack one listing's items (in item_idx order) into chunks under the
    * token/item limits. Items are truncated to MaxItemTokens first. A final
    * chunk with < MinItems is merged into its predecessor when one exists
    * (the reference's small-tail handling). Pure + deterministic. */
  def pack(items: Seq[Item], contextTokens: Int): Seq[Chunk] = {
    val truncated = items.sortBy(_.item_idx)
      .map(i => i.copy(tokens = i.tokens.take(MaxItemTokens)))
    val chunks = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var curIdxs = scala.collection.mutable.ArrayBuffer.empty[Int]
    var curTok = contextTokens
    def flush(): Unit = if (curIdxs.nonEmpty) {
      chunks += Chunk(chunks.size, curIdxs.toSeq, curTok)
      curIdxs = scala.collection.mutable.ArrayBuffer.empty[Int]
      curTok = contextTokens
    }
    truncated.foreach { it =>
      val t = it.tokens.size
      if (curIdxs.nonEmpty &&
          (curIdxs.size >= MaxItems || curTok + t > MaxChunkTokens)) flush()
      curIdxs += it.item_idx
      curTok += t
    }
    flush()
    // merge an undersized tail into the previous chunk
    if (chunks.size >= 2 && chunks.last.item_idxs.size < MinItems) {
      val tail = chunks.remove(chunks.size - 1)
      val prev = chunks.remove(chunks.size - 1)
      chunks += Chunk(prev.chunk_idx,
                      prev.item_idxs ++ tail.item_idxs,
                      prev.n_tokens + tail.n_tokens - contextTokens)
    }
    chunks.toSeq
  }

  /** mentions/items (url, listing_key, item_idx, item_text) → chunks
    * (url, listing_key, chunk_idx, item_idxs, n_tokens). */
  def chunkListings(items: DataFrame, contextTokens: Int = 8): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.select("url", "listing_key", "item_idx", "item_text")
      .as[(String, String, Int, String)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroups { (key: (String, String),
                        rows: Iterator[(String, String, Int, String)]) =>
        val its = rows.map(r => Item(r._3, r._4.split("\\s+").toSeq)).toSeq
        pack(its, contextTokens).map(c =>
          (key._1, key._2, c.chunk_idx, c.item_idxs, c.n_tokens))
      }
      .toDF("url", "listing_key", "chunk_idx", "item_idxs", "n_tokens")
  }
}
