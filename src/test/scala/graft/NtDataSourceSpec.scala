package graft

import org.apache.spark.sql.functions._
import graft.core.NtCodec
import graft.emit.TripleEmit
import graft.sources.NtSource

/** The graft-nt DataSourceV2: parity with the regex/DataFrame parse path,
  * per-file partitions, column pruning and is_literal pushdown. */
class NtDataSourceSpec extends SparkSuite {
  import spark.implicits._

  private lazy val dir = {
    val d = SparkSuite.tempDir("graft-ntv2") + "/nt"
    val triples = Seq(
      ("Ada Prime", "rdf:type", "Scientist", false),
      ("12\"/50 caliber Mark 8 gun", "rdf:type", "Artillery", false),
      ("Ada Prime", "rdfs:label", "Ada \"the first\" programmer", true),
      ("B", "clg:locatedIn", "Country 1", false),
      ("B", "rdfs:label", "42", true))
      .toDF("subj", "pred", "obj", "is_literal")
    TripleEmit.writeNt(triples, d)
    d
  }

  test("DSv2 read == regex-path read (round-trip through writeNt)") {
    val v2 = spark.read.format("graft-nt").load(dir)
      .as[(String, String, String, Boolean)].collect().toSet
    val v1 = NtSource.read(spark, dir)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(v2 == v1 && v2.size == 5)
    // the percent-encoded name decodes back exactly (full %XX inverse)
    assert(v2.exists(_._1 == "12\"/50 caliber Mark 8 gun"))
  }

  test("column pruning reaches the reader") {
    val pruned = spark.read.format("graft-nt").load(dir).select("subj")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("graft-nt"))
    assert(pruned.as[String].collect().toSet ==
      Set("Ada Prime", "12\"/50 caliber Mark 8 gun", "B"))
  }

  test("is_literal filter is pushed and honored") {
    val lits = spark.read.format("graft-nt").load(dir)
      .filter(col("is_literal") === true)
    assert(lits.queryExecution.toString.contains("pushed is_literal=true") ||
           lits.queryExecution.executedPlan.toString
             .contains("pushed is_literal=true"))
    assert(lits.select("obj").as[String].collect().toSet ==
      Set("Ada \"the first\" programmer", "42"))
  }

  test("one input partition per file (pred-partitioned dump reads file-wise)") {
    val n = spark.read.format("graft-nt").load(dir).rdd.getNumPartitions
    val files = new java.io.File(dir).listFiles().count(_.isDirectory)
    assert(files == 3) // 3 predicate partitions
    assert(n >= files, s"expected >= $files partitions, got $n")
  }

  test("decode round-trips the encoder on arbitrary names") {
    val names = Seq("Ada Prime", "Café #1: a,b;c (d)", "12\"/50 x_y",
                    "plain", "a%b")
    names.foreach { n =>
      // '_' is lossy (underscore ≡ space, like the reference's name2label)
      val want = n.replace('_', ' ')
      assert(NtCodec.decodeResourceJava(NtCodec.encodeResourceJava(n)) == want,
             s"round-trip: $n")
    }
  }

  test("bz2-compressed dumps read identically through the codec path") {
    val d = SparkSuite.tempDir("graft-ntbz2") + "/nt"
    val triples = Seq(
      ("Ada Prime", "rdf:type", "Scientist", false),
      ("B", "rdfs:label", "Ada \"the first\" programmer", true),
      ("C\u00e9zanne", "clg:locatedIn", "Country 1", false))
      .toDF("subj", "pred", "obj", "is_literal")
    TripleEmit.writeNt(triples, d, codec = "bzip2")
    // the files really are .bz2
    def files(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
    assert(files(new java.io.File(d))
      .exists(_.getName.endsWith(".bz2")))
    val v2 = spark.read.format("graft-nt").load(d)
      .as[(String, String, String, Boolean)].collect().toSet
    val v1 = NtSource.read(spark, d)
      .as[(String, String, String, Boolean)].collect().toSet
    assert(v2 == v1 && v2.size == 3, s"$v2")
    // pushdown still applies through the codec stream
    assert(spark.read.format("graft-nt").load(d)
      .filter(col("is_literal") === true).count() == 1)
  }

  test("large plain files split into line-aligned ranges, results identical") {
    val d = SparkSuite.tempDir("graft-ntsplit") + "/nt"
    val triples = (0 until 20000).map(i =>
      (s"Entity padded name $i", "rdf:type", s"Type ${i % 7}", false))
      .toDF("subj", "pred", "obj", "is_literal")
    TripleEmit.writeNt(triples.coalesce(1), d)
    val whole = spark.read.format("graft-nt").load(d)
    val split = spark.read.format("graft-nt")
      .option("maxSplitBytes", 64 * 1024).load(d)
    assert(whole.rdd.getNumPartitions < split.rdd.getNumPartitions,
      s"expected range splits: ${split.rdd.getNumPartitions}")
    assert(split.rdd.getNumPartitions >= 10)
    val a = whole.as[(String, String, String, Boolean)].collect().sorted
    val b = split.as[(String, String, String, Boolean)].collect().sorted
    assert(a.sameElements(b) && a.length == 20000)
  }
}
