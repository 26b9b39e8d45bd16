package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import graft.ingest.TextExtract
import graft.listings.ListingExtract
import graft.link.AliasLink

/** Streaming KG-construction front-end — incremental ingest of the north
  * rule's page table (url, warc_ts, html, text, lang).
  *
  * The batch pipeline's prefix (invariant text extraction → page-local
  * listing/mention parse → broadcast alias link) is STATELESS by
  * construction: every step is a row-local projection/flatMap or a
  * stream-static broadcast join, and the link argmax runs on the
  * dictionary side (W2 reduction), never over the stream. So the exact
  * batch operators run unchanged under `readStream` — the streaming plan
  * IS the batch plan applied per micro-batch (asserted streaming ≡ batch
  * in StreamingIngestSpec), with one streaming-only addition: re-crawl
  * dedup by url via `dropDuplicatesWithinWatermark` (state bounded by the
  * watermark horizon — the same discipline as
  * [[Streams.streamingDedup]]; a crawl front-end re-fetches pages, and
  * only the first copy inside the horizon may emit mentions).
  *
  * The corpus-level stages stay batch on purpose: F9 boilerplate counts,
  * rule mining, taxonomy inference, and canonicalization are global
  * aggregations over the accumulated corpus — the reference's own cycle
  * runs them over snapshots (`impl/subject_entity/__init__.py`'s
  * batch extraction loop), and the standard shape at 10^12 documents is
  * exactly this split: streaming extract+link appending to the mentions
  * table, periodic batch inference over it (`Pipeline.run` from the
  * "linked_all" stage on).
  */
object StreamingIngest {

  /** The north-rule page-table schema (input_hint). */
  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** The stateless extract→parse→link prefix. `pages` may be a batch OR a
    * streaming DataFrame — the operators are identical (that equivalence
    * is the point). Output: one row per kept mention with its linked
    * entity (`ent` null = NIL candidate for the downstream batch stages). */
  def linkedMentions(pages: DataFrame, dict: DataFrame): DataFrame =
    AliasLink.linkAll(
      ListingExtract.mentions(TextExtract.extract(pages)), dict)

  /** Streaming XML dump ingest: [[graft.sources.XmlDumpSource]] is pure
    * row-local parse over split-aligned `</page>` records, so the same
    * operators run unchanged under `readStream` — new dump files landing
    * in `dir` stream through in append mode with zero state (asserted
    * streaming ≡ batch across micro-batches in XmlDumpSourceSpec). */
  def streamingDumpPages(spark: SparkSession, dir: String): DataFrame =
    graft.sources.XmlDumpSource.pages(
      spark.readStream.option("lineSep", "</page>").text(dir))

  /** Streaming form over a parquet page source: watermarked re-crawl
    * dedup by url, then the shared prefix. */
  def streamingLinkedMentions(spark: SparkSession, pagesDir: String,
                              dict: DataFrame,
                              watermark: String = "1 hour"): DataFrame =
    linkedMentions(
      spark.readStream.schema(pageSchema).parquet(pagesDir)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark("url"),
      dict)
}
