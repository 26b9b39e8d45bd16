package graft.tools
import org.apache.spark.sql.SparkSession
object PipelineSoak {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    val world = graft.testkit.CorpusGen.World(nCountries = 250, knownPerListing = 12)
    val seeds = world.seeds(spark)
    val out = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val n = spark.read.parquet(pagesPath).count()
    val t0 = System.nanoTime()
    val triples = graft.Pipeline.run(spark, spark.read.parquet(pagesPath), seeds, out)
    val nt = triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"SOAK pages=$n triples=$nt sec=$sec pages_per_s=${n/sec} triples_per_s=${nt/sec}")
    spark.stop()
  }
}
