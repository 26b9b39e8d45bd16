package graft.tools
import org.apache.spark.sql.SparkSession
/** args: pagesPath [mode] — mode "cc" (default) or "ed" (ScoredEd). */
object PipelineSoak {
  def main(args: Array[String]): Unit = {
    val pagesPath = args(0)
    val mode = if (args.length > 1) args(1) else "cc"
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
    val canon =
      if (mode == "ed") graft.Pipeline.Canonicalization.ScoredEd()
      else graft.Pipeline.Canonicalization.Components
    val t0 = System.nanoTime()
    val triples = graft.Pipeline.run(spark, spark.read.parquet(pagesPath),
                                     seeds, out, canon = canon)
    val nt = triples.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"SOAK mode=$mode pages=$n triples=$nt sec=$sec " +
            s"pages_per_s=${n/sec} triples_per_s=${nt/sec}")
    spark.stop()
  }
}
