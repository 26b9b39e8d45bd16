package graft

import org.apache.spark.sql.functions._
import graft.link.AliasLink
import graft.streaming.StreamingIngest
import graft.testkit.CorpusGen

/** Streaming KG ingest: the batch pipeline's stateless prefix under
  * readStream — streaming ≡ batch on the deterministic corpus, and the
  * watermarked re-crawl dedup drops a duplicate second fetch. */
class StreamingIngestSpec extends SparkSuite {
  import spark.implicits._

  private lazy val world = CorpusGen.default
  private lazy val seeds = world.seeds(spark)
  private lazy val dict = AliasLink.buildDict(
    if (seeds.redirects == null) seeds.aliases
    else AliasLink.foldRedirects(seeds.aliases, seeds.redirects))

  private def collectMentions(df: org.apache.spark.sql.DataFrame) =
    df.select("url", "listing_key", "item_idx", "mention_id", "label",
              "ent")
      .as[(String, String, Int, String, String, Option[String])]
      .collect().sorted

  test("streaming linked mentions == batch prefix, across micro-batches") {
    val dir = SparkSuite.tempDir("graft-sing")
    val pages = world.pages.toDS().toDF()
    // batch 1: first half of the corpus; batch 2: the rest PLUS an exact
    // re-crawl of batch 1 (same urls, later warc_ts) that the watermarked
    // url-dedup must drop
    val half = pages.count() / 2
    val ordered = pages.orderBy("url")
    val b1 = ordered.limit(half.toInt)
    val b2 = ordered.join(b1.select("url"), Seq("url"), "left_anti")
    b1.write.parquet(s"$dir/in/b1")

    val q = StreamingIngest
      .streamingLinkedMentions(spark, s"$dir/in/*", dict)
      .writeStream.outputMode("append")
      .format("memory").queryName("sing")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    val afterB1 = spark.table("sing").count()

    b2.unionByName(
        b1.withColumn("warc_ts",
                      col("warc_ts") + expr("INTERVAL 10 MINUTES")))
      .write.parquet(s"$dir/in/b2")
    q.processAllAvailable()
    val streamed = collectMentions(spark.table("sing"))
    q.stop()

    val batch = collectMentions(
      StreamingIngest.linkedMentions(pages, dict))
    assert(streamed.sameElements(batch),
           s"streaming ${streamed.length} rows vs batch ${batch.length}")
    assert(afterB1 > 0 && afterB1 < streamed.length,
           "both micro-batches must contribute")
    // the re-crawled copies were dropped, not double-counted
    assert(streamed.map(_._4).distinct.length == streamed.length)
  }
}
