package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-decomposition probe: args = cpus pagesPath mode repeats.
  * mode: read | extract | mentions | link */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val pagesPath = args(1)
    val mode = args(2)
    val repeats = if (args.length > 3) args(3).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    import spark.implicits._
    val world = graft.testkit.CorpusGen.World(nCountries = 250,
                                              knownPerListing = 12)
    val seeds = world.seeds(spark)
    def job(): Long = {
      val pages = spark.read.parquet(pagesPath)
      mode match {
        case "read" => pages.select(count(length(col("text")))).first(); pages.count()
        case "extract" =>
          graft.ingest.TextExtract.extract(pages)
            .select(sum(length(col("text")))).first(); 0L
        case "mentions" =>
          graft.listings.ListingExtract.mentions(
            graft.ingest.TextExtract.extract(pages)).count()
        case "link" =>
          val m = graft.listings.ListingExtract.mentions(
            graft.ingest.TextExtract.extract(pages))
          graft.link.AliasLink.link(m,
            graft.link.AliasLink.buildDict(seeds.aliases))._1.count()
      }
    }
    job() // warm
    val times = (1 to repeats).map { _ =>
      val t0 = System.nanoTime(); job(); (System.nanoTime() - t0) / 1e9
    }
    println(s"MICRO cpus=$cpus mode=$mode best=${times.min} all=${times.mkString(",")}")
    spark.stop()
  }
}
