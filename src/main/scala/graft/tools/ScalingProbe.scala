package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-JVM-one-level scaling probe: args = cpus pagesPath [repeats]. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pagesPath = args(1)
    val repeats = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // fine-grained scan splits: the corpus is many small files; default
      // packing (128 MB + 4 MB open cost) folds them into ~9 coarse tasks,
      // which caps an 8-thread run at ~2 waves with a straggler tail
      .config("spark.sql.files.maxPartitionBytes", (2L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (64L * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    import spark.implicits._
    val world = graft.testkit.CorpusGen.World(nCountries = 250,
                                              knownPerListing = 12)
    val seeds = world.seeds(spark)
    def job(): Long = {
      val pages = spark.read.parquet(pagesPath)
      val text = graft.ingest.TextExtract.extract(pages)
      val mentions = graft.listings.ListingExtract.mentions(text)
      val dict = graft.link.AliasLink.buildDict(seeds.aliases)
      graft.link.AliasLink.link(mentions, dict)._1.count()
    }
    val n = spark.read.parquet(pagesPath).count()
    job() // warm-up
    val times = (1 to repeats).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }
    println(s"SCALING cpus=$cpus pages=$n times=${times.mkString(",")} " +
            s"best_pages_per_s=${n / times.min}")
    spark.stop()
  }
}
