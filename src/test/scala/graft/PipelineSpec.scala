package graft

import org.apache.spark.sql.functions._
import graft.testkit.CorpusGen
import graft.emit.TripleDiff

/** End-to-end gate: full pipeline on the deterministic corpus must
  * reproduce the expected triple set at P/R >= 0.95 (north rule; in fact
  * exactly 1.0 — any drift is a semantics bug, so we assert both). */
class PipelineSpec extends SparkSuite {
  import spark.implicits._

  private lazy val world = CorpusGen.default
  private lazy val seeds = world.seeds(spark)

  test("pipeline reproduces expected triples at P/R >= 0.95 (exact match)") {
    val outDir = SparkSuite.tempDir("graft-pipe")
    val triples = Pipeline.run(spark, world.pages.toDS().toDF(), seeds, outDir)
    val expected = world.expectedTriples.toDS().toDF()
    val pr = TripleDiff.diff(triples, expected)
    if (pr.precision < 1.0 || pr.recall < 1.0) {
      TripleDiff.diffByPred(triples, expected).show(50, truncate = false)
      triples.join(expected, Seq("subj", "pred", "obj", "is_literal"),
                   "left_anti").show(30, truncate = false)
      expected.join(triples, Seq("subj", "pred", "obj", "is_literal"),
                    "left_anti").show(30, truncate = false)
    }
    assert(pr.precision >= 0.95 && pr.recall >= 0.95,
           s"P/R gate failed: $pr")
    assert(pr.precision == 1.0 && pr.recall == 1.0, s"exact-match drift: $pr")
    // F9: the planted boilerplate label must not leak into any triple
    assert(triples.filter(col("subj").contains("loremipsum") ||
                          col("obj").contains("Lorem Ipsum")).count() == 0)
  }

  test("Hearst hypernym stage mines the planted prose counts") {
    val outDir = SparkSuite.tempDir("graft-hyp")
    Pipeline.run(spark, world.pages.toDS().toDF(), seeds, outDir)
    val got = spark.read.parquet(s"$outDir/hypernyms")
      .as[(String, String, Long)].collect().toSet
    assert(got == world.expectedHypernyms.toSet, s"got $got")
  }

  test("triples are written partitioned by predicate") {
    val outDir = SparkSuite.tempDir("graft-part")
    Pipeline.run(spark, world.pages.toDS().toDF(), seeds, outDir)
    val dirs = new java.io.File(s"$outDir/triples").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("pred=")), s"no pred partitions: $dirs")
    assert(dirs.size >= 3, s"expected >=3 predicate partitions, got $dirs")
  }

  test("pipeline output is invariant to input partitioning") {
    val out1 = SparkSuite.tempDir("graft-p1")
    val out2 = SparkSuite.tempDir("graft-p2")
    val pagesDf = world.pages.toDS().toDF()
    val t1 = Pipeline.run(spark, pagesDf.repartition(1), seeds, out1)
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().sorted
    val t2 = Pipeline.run(spark, pagesDf.repartition(16), seeds, out2)
      .select("subj", "pred", "obj").as[(String, String, String)]
      .collect().sorted
    assert(t1.sameElements(t2))
  }
}
