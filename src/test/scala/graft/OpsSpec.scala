package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaDecoder
import graft.ops.Dedup
import graft.streaming.Streams

/** Cross-path equality specs for the training-data operators: the scale
  * path must agree with the oracle-checkable path where both exist. */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("MinHash-LSH finds exactly the n-gram-Jaccard near-dup pairs") {
    val lsh = Dedup.minhashLsh(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    // LSH at 4 bands × 2 rows has recall ~1 at jac >= 0.5 on planted dups;
    // verification makes precision exact — sets must match on this corpus.
    assert(lsh == exact, s"lsh=${lsh.size} exact=${exact.size}")
  }

  test("fast (xxhash64) MinHash-LSH candidates cover the verified pairs") {
    val fast = Dedup.minhashLshFast(spark, sf)
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(fast),
           s"missing: ${exact.diff(fast).take(5)}")
  }

  test("multimodal: mapPartitions decode == pure-Column decode") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
              to_binary(col("text"), lit("utf-8")).as("content"))
    val typed = docs.as[(Long, Array[Byte])]
    val viaPartitions = MediaDecoder.decodeMeta(typed).toDF()
      .withColumnRenamed("nFrames", "n_frames")
      .as[(Long, String, Int, Int, Int)].collect().sorted
    val viaColumns = MediaDecoder.decodeMetaColumns(docs)
      .as[(Long, String, Int, Int, Int)].collect().sorted
    assert(viaPartitions.sameElements(viaColumns))
  }

  test("multimodal: frame sampling strides over nFrames") {
    val decoded = MediaDecoder.decodeMeta(
      Seq((1L, Array.fill[Byte](25)(7))).toDS()) // nFrames = 25%10+1 = 6
    val frames = MediaDecoder.frameSample(decoded, stride = 2)
      .as[(Long, Int)].collect().sorted
    assert(frames.toSeq == Seq((1L, 0), (1L, 2), (1L, 4)))
  }

  test("streaming windowed counts == batch windowed counts") {
    val batch = Streams.windowedCounts(
      graft.core.Tables.events(spark, sf))
      .as[(Long, String, Long, Double)].collect().sorted
    // readStream needs a directory to watch — stage the file into one
    val streamDir = SparkSuite.tempDir("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf + "/events.parquet"),
      java.nio.file.Paths.get(streamDir, "events.parquet"))
    val q = Streams.streamingWindowedCounts(spark, streamDir)
      .withColumn("window_start", unix_timestamp(col("window_start")))
      .writeStream.outputMode("complete")
      .format("memory").queryName("wincounts").start()
    q.processAllAvailable()
    val streamed = spark.table("wincounts")
      .as[(Long, String, Long, Double)].collect().sorted
    q.stop()
    assert(streamed.sameElements(batch))
  }
}
