package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** args: out replicate [nCountries] [knownPerListing] — replicate copies
  * the SAME world's pages under distinct urls (entity space fixed: every
  * alignment component spans all replicas — the head-entity worst case);
  * a large nCountries with replicate=1 instead WIDENS the world (entity
  * space ∝ corpus: components stay local — the tail-entity shape). */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0); val replicate = args(1).toInt
    val nCountries = if (args.length > 2) args(2).toInt else 250
    val knownPer = if (args.length > 3) args(3).toInt else 12
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "8g").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val world = graft.testkit.CorpusGen.World(nCountries = nCountries,
                                              knownPerListing = knownPer)
    val base = spark.createDataset(world.pages).toDF()
    base.crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .withColumn("url", concat(col("url"), lit("?rep="), col("rep")))
      .drop("rep").repartition(256).write.mode("overwrite").parquet(out)
    println("pages=" + spark.read.parquet(out).count())
    spark.stop()
  }
}
