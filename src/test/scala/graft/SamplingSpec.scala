package graft

import org.apache.spark.sql.functions._
import graft.ops.Sampling

/** Deterministic sampling passes: weighted mixing, split assignment,
  * per-key caps — reproducibility and partition invariance. */
class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private def docs(n: Int) = spark.range(n).select(
    col("id").as("doc_id"),
    concat(lit("src"), pmod(col("id"), lit(4))).as("source"))

  test("mixing keeps ~weight fraction, deterministically, join-scoped") {
    val weights = Seq(("src0", 1.0), ("src1", 0.5), ("src2", 0.0))
      .toDF("source", "weight")
    val out = Sampling.mixBySource(docs(4000), weights)
    val bySrc = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 1000)           // weight 1.0 keeps everything
    assert(!bySrc.contains("src2"))          // weight 0.0 keeps nothing
    assert(!bySrc.contains("src3"))          // absent from the mix table
    val frac = bySrc("src1").toDouble / 1000
    assert(frac > 0.4 && frac < 0.6, s"src1 kept $frac")
    // bit-identical on re-run and under different partitioning
    val again = Sampling.mixBySource(docs(4000).repartition(17), weights)
    assert(out.select("doc_id").except(again.select("doc_id")).count() == 0)
    assert(again.count() == out.count())
  }

  test("split fractions hold globally and within every stratum") {
    val out = Sampling.assignSplit(docs(8000))
    val total = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(total("train") > 6800 && total("train") < 7500)
    assert(total("val") > 250 && total("val") < 600)
    assert(total("test") > 250 && total("test") < 600)
    // stratification for free: per-source train share stays near 0.9
    val perSrc = out.groupBy("source")
      .agg((sum(when(col("split") === "train", 1).otherwise(0)) /
            count(lit(1))).as("share"))
      .as[(String, Double)].collect()
    perSrc.foreach { case (s, share) =>
      assert(share > 0.85 && share < 0.95, s"$s train share $share") }
  }

  test("cap keeps exactly k per key, a partition-invariant subset") {
    val out = Sampling.capPerKey(docs(1000), "source", 7)
    val counts = out.groupBy("source").count().as[(String, Long)].collect()
    assert(counts.length == 4 && counts.forall(_._2 == 7))
    val again = Sampling.capPerKey(docs(1000).repartition(13), "source", 7)
    assert(out.except(again).count() == 0 && again.count() == 28)
    // a key with fewer rows than k survives whole
    val tiny = Seq((1L, "solo")).toDF("doc_id", "source")
    assert(Sampling.capPerKey(tiny, "source", 7).count() == 1)
  }

  test("bucket16 matches the documented DuckDB spelling") {
    // '0x' || substr(md5('42mix'),1,4) = 0x40b9 = 16569 (checked in DuckDB)
    val got = spark.range(1)
      .select(Sampling.bucket16(lit("42"), "mix")).as[Long].head()
    assert(got == 16569L)
  }
}
