package graft

import org.apache.spark.sql.functions._
import graft.mine.NegativeSampling

/** M4 negative-sample synthesis vs the reference's contract
  * (`chunking.py:37-68`): per-type counts = int(n_chunks * ratio), table
  * negatives drawn from a single column-count group chosen ∝ group size,
  * groups of < 3 listings never sampled, 3..min(L,16) DISTINCT source
  * listings per negative, item indices within the source listing's range —
  * and the md5-derived choices reproduce an independently computed JVM
  * twin (the property the DuckDB oracle relies on). */
class NegativeSamplingSpec extends SparkSuite {
  import spark.implicits._

  // 12 tables: 5 with 2 cols, 4 with 3 cols, 2 with 9 cols (dropped: < 3
  // listings), plus 6 enums and one lonely 7-col table (dropped)
  private val listings = (
    (1 to 5).map(k => (f"T2$k%02d", "table", 2, 4 + k % 3)) ++
    (1 to 4).map(k => (f"T3$k%02d", "table", 3, 5)) ++
    (1 to 2).map(k => (f"T9$k%02d", "table", 9, 4)) ++
    Seq(("T701", "table", 7, 8)) ++
    (1 to 6).map(k => (f"E$k%02d", "enum", 0, 3 + k))
  ).toDF("listing_key", "listing_type", "n_cols", "n_items")

  private val chunkCounts =
    Seq(("table", 40L), ("enum", 10L)).toDF("listing_type", "n_chunks")

  private def sample(seed: String = "s1") =
    NegativeSampling.negativeListings(listings, chunkCounts, 0.3, seed)

  test("per-type negative counts = int(n_chunks * ratio)") {
    val n = sample().groupBy("listing_type")
      .agg(countDistinct("neg_id").as("n"))
      .as[(String, Long)].collect().toMap
    assert(n === Map("table" -> 12L, "enum" -> 3L)) // int(40*.3), int(10*.3)
  }

  test("slots: contiguous 0..k-1, 3 <= k <= min(L,16), sources distinct, " +
       "single group per negative, item_idx in range") {
    val rows = sample().as[(String, String, Int, String, Long, String, Long)]
      .collect().groupBy(_._1)
    val nItems = listings.as[(String, String, Int, Int)].collect()
      .map(r => r._1 -> r._4).toMap
    rows.foreach { case (negId, rs) =>
      val slots = rs.map(_._5).sorted
      assert(slots === (0L until rs.length.toLong).toArray.toSeq,
             s"$negId slots")
      assert(rs.length >= 3 && rs.length <= 16, s"$negId slot count")
      val srcs = rs.map(_._6)
      assert(srcs.distinct.length === srcs.length, s"$negId distinct srcs")
      // one group: all sources + the context share the negative's n_cols
      assert(rs.map(_._3).distinct.length === 1, s"$negId one group")
      val nc = rs.head._3
      assert(rs.length <= (if (nc == 2) 5 else if (nc == 3) 4 else 6),
             s"$negId slots <= group size")
      (srcs :+ rs.head._4).foreach { k =>
        val expectCols = listings.filter(col("listing_key") === k)
          .select("n_cols").as[Int].head()
        assert(expectCols === nc, s"$negId group member $k")
      }
      rs.foreach(r => assert(r._7 >= 0 && r._7 < nItems(r._6),
                             s"$negId item_idx"))
    }
  }

  test("undersized groups (9-col pair, lonely 7-col) are never sampled") {
    val cols = sample().select("n_cols").distinct().as[Int].collect().toSet
    assert(!cols.contains(9) && !cols.contains(7))
  }

  test("deterministic per seed; seed changes the draw; partition-invariant") {
    val a = sample().collect().map(_.toString).sorted.toSeq
    val b = sample().collect().map(_.toString).sorted.toSeq
    val c = sample("other-seed").collect().map(_.toString).sorted.toSeq
    assert(a === b)
    assert(a !== c)
    val rep = NegativeSampling.negativeListings(
      listings.repartition(7), chunkCounts, 0.3, "s1")
      .collect().map(_.toString).sorted.toSeq
    assert(a === rep)
  }

  test("md5 index derivation matches an independent JVM twin") {
    def h(parts: String*): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(parts.mkString("|").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(12), 16)
    }
    // recompute negative table#0 by hand: groups in gk order t2(5), t3(4)
    // → ranges [0,5) [5,9), total 9
    val r = h("s1", "grp", "0") % 9
    val (gkSize, keys) =
      if (r < 5) (5, (1 to 5).map(k => f"T2$k%02d"))
      else (4, (1 to 4).map(k => f"T3$k%02d"))
    val ctx = keys(( h("s1", "ctx", "0") % gkSize ).toInt)
    val nSlots = 3 + (h("s1", "n", "0") % (math.min(gkSize, 16) - 3 + 1)).toInt
    val start = (h("s1", "smp", "0") % gkSize).toInt
    val expected = (0 until nSlots).map { j =>
      val src = keys((start + j) % gkSize)
      val nIt = listings.filter(col("listing_key") === src)
        .select("n_items").as[Int].head()
      (j.toLong, src, h("s1", "it", "0", j.toString) % nIt)
    }.toSet
    val got = sample().filter(col("neg_id") === "table#0")
      .select(col("slot"), col("src_listing_key"), col("item_idx"))
      .as[(Long, String, Long)].collect().toSet
    assert(got === expected)
    assert(sample().filter(col("neg_id") === "table#0")
      .select("ctx_listing_key").distinct().as[String].collect().toSeq
      === Seq(ctx))
  }
}
