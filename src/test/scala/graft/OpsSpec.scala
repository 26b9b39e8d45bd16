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

  test("hot LSH buckets degrade to star pairs instead of dropping the cluster") {
    val dir = SparkSuite.tempDir("graft-hot-bucket")
    // MaxBucket+5 copies of one template: every copy lands in the SAME
    // bucket in every band (identical signatures), i.e. the mass-duplicated
    // boilerplate regime. A cap that silently drops hot buckets finds ZERO
    // pairs here; star pairing must connect every copy to the bucket min.
    val template = (1 to 40).map(i => s"tok$i").mkString(" ")
    val n = Dedup.MaxBucket + 5
    val docs = (0 until n).map(i => (i.toLong, template, "en", "tpl", 40L)) :+
      ((100L, (1 to 40).map(i => s"zzz$i").mkString(" "), "en", "x", 40L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val star = (1 until n).map(i => (0L, i.toLong)).toSet
    val lsh = Dedup.minhashLsh(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lsh == star, s"lsh=${lsh.size}, want star=${star.size}")
    val fast = Dedup.minhashLshFast(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(star.subsetOf(fast))
    val sim = Dedup.simhash(spark, dir)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(star.subsetOf(sim), s"sim=${sim.size}")
    assert(!sim.exists(p => p._1 == 100L || p._2 == 100L))
  }

  test("fast (xxhash64) MinHash-LSH candidates cover the verified pairs") {
    val fast = Dedup.minhashLshFast(spark, sf)
      .as[(Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccard(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(exact.subsetOf(fast),
           s"missing: ${exact.diff(fast).take(5)}")
  }

  test("simhash banded blocking finds ALL Hamming<=3 pairs (pigeonhole)") {
    // property: for 64-bit fingerprints split into 4x16-bit bands, any pair
    // with Hamming <= 3 shares at least one identical band — banded
    // candidate generation (uncapped) has 100% recall vs brute force.
    val rnd = new scala.util.Random(42)
    val base = Array.fill(200)(rnd.nextLong())
    // plant near-dups: flip 0-5 random bits off existing fingerprints
    val fps = (base ++ base.take(60).map { f =>
      (0 until rnd.nextInt(6)).foldLeft(f)((acc, _) =>
        acc ^ (1L << rnd.nextInt(64)))
    }).zipWithIndex.map { case (f, i) => (i.toLong, f) }
    def band(f: Long, k: Int): Long = (f >>> (k * 16)) & 0xFFFFL
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && java.lang.Long.bitCount(fa ^ fb) <= Dedup.HammingMax
    } yield (a, b)).toSet
    val banded = (for {
      (a, fa) <- fps; (b, fb) <- fps
      if a < b && (0 until Dedup.SimhashBands).exists(k => band(fa, k) == band(fb, k))
      if java.lang.Long.bitCount(fa ^ fb) <= Dedup.HammingMax
    } yield (a, b)).toSet
    assert(brute == banded, s"banded blocking missed ${brute.diff(banded).size} pairs")
    assert(brute.nonEmpty, "fixture must contain planted near-dup pairs")
  }

  test("simhash: 64-bit banded pairs agree with the DataFrame operator") {
    // the operator on sf0.001 returns exactly the capped-bucket banded pairs
    val got = Dedup.simhash(spark, sf)
      .select("a", "b", "hamming").as[(Long, Long, Int)].collect().toSet
    // every reported pair really is Hamming <= 3 (verification is exact)
    assert(got.forall(_._3 <= Dedup.HammingMax))
    // and symmetric duplicates / self-pairs never appear
    assert(got.forall(p => p._1 < p._2))
  }

  test("ann lshCosine: degenerate bucket (identical vectors) is capped, not quadratic") {
    import graft.ops.Ann
    // 3*MaxBucket identical vectors -> one signature bucket per band holding
    // all of them; without the cap that is a (3*MaxBucket)^2/2 self-join in
    // one task. With the cap the bucket is cut and yields NO candidates.
    val n = Ann.MaxBucket * 3
    val dir = SparkSuite.tempDir("graft-lsh-degenerate")
    val vecs = (0 until n).map(i =>
      (i.toLong, Array.fill(8)(1.0f), "x"))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Ann.lshCosine(spark, dir)
    assert(out.isEmpty, "capped degenerate bucket must yield no candidate pairs")
  }

  test("multimodal: real header parse round-trips generator metadata") {
    import graft.multimodal.{MediaFixtures => F}
    for ((w, h) <- Seq((1, 1), (16, 495), (655, 16), (320, 240))) {
      assert(MediaDecoder.decodeHeader(F.png(w, h)) ==
        MediaDecoder.MediaMeta("png", w, h, 1))
      assert(MediaDecoder.decodeHeader(F.jpeg(w, h)) ==
        MediaDecoder.MediaMeta("jpg", w, h, 1))
      for (n <- Seq(1, 6, 10))
        assert(MediaDecoder.decodeHeader(F.gif(w, h, n)) ==
          MediaDecoder.MediaMeta("gif", w, h, n))
    }
    // non-media payloads degrade to "bin", never throw
    assert(MediaDecoder.decodeHeader(Array[Byte]()).fmt == "bin")
    assert(MediaDecoder.decodeHeader("just text".getBytes).fmt == "bin")
    assert(MediaDecoder.decodeHeader(Array.fill[Byte](64)(0x2C)).fmt == "bin")
  }

  test("multimodal: parser handles structures the generator never emits") {
    // hand-built PNG (independent bytes — a generator/parser co-bug would
    // round-trip): 2x3, exact IHDR layout
    val png = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 2, 0, 0, 0, 3, 8, 6, 0, 0, 0, 0, 0, 0, 0).map(_.toByte)
    assert(MediaDecoder.decodeHeader(png) ==
      MediaDecoder.MediaMeta("png", 2, 3, 1))
    // JPEG with a padded fill byte before the SOF2 (progressive) marker
    val jpg = Array(0xFF, 0xD8, 0xFF, 0xDB, 0x00, 0x04, 1, 2,
      0xFF, 0xFF, 0xC2, 0x00, 0x0B, 8, 0, 7, 0, 9, 1, 1, 0x11, 0,
      0xFF, 0xD9).map(_.toByte)
    assert(MediaDecoder.decodeHeader(jpg) ==
      MediaDecoder.MediaMeta("jpg", 9, 7, 1))
    // GIF87a with a global color table (2 entries) + a graphic-control
    // extension before its single frame: skip paths must not miscount
    val gif = (Array('G', 'I', 'F', '8', '7', 'a').map(_.toByte) ++
      Array[Byte](5, 0, 4, 0, 0x80.toByte, 0, 0) ++ // 5x4, GCT flag, size 0
      Array.fill[Byte](6)(0x2C) ++                  // GCT: 2*3 bytes of 0x2C
      Array[Byte](0x21, 0xF9.toByte, 4, 0, 0, 0, 0, 0) ++ // GCE + terminator
      Array[Byte](0x2C, 0, 0, 0, 0, 5, 0, 4, 0, 0, 2, 1, 0x2C, 0) ++
      Array[Byte](0x3B))
    assert(MediaDecoder.decodeHeader(gif) ==
      MediaDecoder.MediaMeta("gif", 5, 4, 1))
  }

  test("multimodal: driver query == doc_id arithmetic (decode round-trip)") {
    val got = graft.multimodal.MultimodalQueries.decodeMeta(spark, sf)
      .as[(Long, String, Int, Int, Int)].collect().sorted
    val expected = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpg").otherwise("gif").as("fmt"),
        (col("doc_id") % 640 + 16).cast("int").as("width"),
        (col("doc_id") * 7 % 480 + 16).cast("int").as("height"),
        when(col("doc_id") % 3 === 2, col("doc_id") % 10 + 1).otherwise(1)
          .cast("int").as("n_frames"))
      .as[(Long, String, Int, Int, Int)].collect().sorted
    assert(got.sameElements(expected))
  }

  test("multimodal: frame sampling strides over nFrames") {
    val decoded = MediaDecoder.decodeMeta(Seq(
      (1L, graft.multimodal.MediaFixtures.gif(8, 8, 6)),
      // a non-media payload decodes to ("bin", nFrames = 0) on the REAL
      // decoder — it must sample zero frames, not crash sequence(0, -1)
      (2L, "not an image".getBytes("UTF-8"))).toDS())
    val frames = MediaDecoder.frameSample(decoded, stride = 2)
      .as[(Long, Int)].collect().sorted
    assert(frames.toSeq == Seq((1L, 0), (1L, 2), (1L, 4)))
  }

  test("repetition signals: hand-computed fixture") {
    val dir = SparkSuite.tempDir("graft-repetition")
    Seq(
      (1L, "a a a a", "en", "s", 7L),     // 4 tokens, all 'a'
      (2L, "a b c d", "en", "s", 7L),     // no repetition
      (3L, "x y x y x y", "en", "s", 11L) // period-2 loop
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.TextOps.repetition(spark, dir)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    // doc 1: top 4/4; bigrams [aa,aa,aa] -> dup 2/3; trigrams [aaa,aaa] -> 1/2
    // doc 2: top 1/4; no duplicate n-grams
    // doc 3: top 3/6; bigrams [xy,yx,xy,yx,xy] -> dup 3/5;
    //        trigrams [xyx,yxy,xyx,yxy] -> dup 2/4
    assert(got.toSeq == Seq(
      (1L, 1.0, 0.666667, 0.5),
      (2L, 0.25, 0.0, 0.0),
      (3L, 0.5, 0.6, 0.5)))
  }

  test("common-ngram boilerplate share: planted boilerplate is flagged") {
    val dir = SparkSuite.tempDir("graft-common-ngrams")
    // the shingle "one two three" appears in CommonDf docs (boilerplate);
    // each doc also carries a unique tail shingle
    val boiler = (1 to Dedup.CommonDf).map(i =>
      (i.toLong, s"one two three tail$i x$i y$i", "en", "s", 0L))
    val clean = Seq((99L, "only unique content here now", "en", "s", 0L))
    (boiler ++ clean).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.ops.Dedup.commonNgrams(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // boilerplate docs: 6 tokens -> 4 distinct shingles, exactly 1 common
    boiler.foreach { case (id, _, _, _, _) =>
      assert(got.contains((id, 4L, 1L, 0.25)), s"doc $id: $got")
    }
    assert(got.contains((99L, 3L, 0L, 0.0)))
  }

  test("paragraph dedup: first occurrence wins globally, document order kept") {
    val docs = Seq(
      (1L, "intro\n\nshared boilerplate\n\nbody one"),
      (2L, "shared boilerplate\n\nbody two"), // boilerplate already seen in doc 1
      (3L, "  \n\nbody three")               // blank paragraph never indexes
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedupDf(docs, "\n\n")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, "intro\n\nshared boilerplate\n\nbody one", 3L, 0L),
      (2L, "body two", 1L, 1L),
      (3L, "body three", 1L, 0L)))
  }

  test("decontamination: only docs sharing a full 8-gram with the benchmark flag") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // window [a..h] hits the benchmark
      (2L, "a b c d e f g x i j"), // differs inside every 8-window
      (3L, "z y x w v u t s"),     // exactly 8 tokens, no overlap
      (4L, "a b c d e f g")        // 7 tokens — below the shingle width
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f g h")).toDF("doc_id", "text")
    val out = Dedup.decontaminateDf(docs, bench, 8)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(out == Set((1L, 1L, true), (2L, 0L, false),
                      (3L, 0L, false), (4L, 0L, false)))
  }

  test("cluster-keep composes near-dup pairs into kept representatives") {
    val pairs = Dedup.ngramJaccard(spark, sf)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val keep = Dedup.clusterKeep(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    val cluster = keep.map(r => r._1 -> r._2).toMap
    // exactly the documents that occur in a near-dup pair are clustered
    assert(cluster.keySet == pairs.flatMap(p => Set(p._1, p._2)))
    // both ends of every pair land in the same cluster
    pairs.foreach { case (a, b) =>
      assert(cluster(a) == cluster(b), s"pair ($a,$b) split")
    }
    // the representative is the cluster minimum, and is flagged kept
    keep.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._1).min == c)
      assert(rows.count(_._3) == 1 && rows.find(_._3).get._1 == c)
    }
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
