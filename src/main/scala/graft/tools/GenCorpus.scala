package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val out = args(0); val replicate = args(1).toInt
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val world = graft.testkit.CorpusGen.World(nCountries = 250, knownPerListing = 12)
    val base = spark.createDataset(world.pages).toDF()
    base.crossJoin(spark.range(replicate).select(col("id").as("rep")))
      .withColumn("url", concat(col("url"), lit("?rep="), col("rep")))
      .drop("rep").repartition(256).write.mode("overwrite").parquet(out)
    println("pages=" + spark.read.parquet(out).count())
    spark.stop()
  }
}
