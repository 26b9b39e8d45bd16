package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ExplainTest {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    import spark.implicits._
    val world = graft.testkit.CorpusGen.default
    val pages = spark.createDataset(world.pages).toDF()
    val seeds = world.seeds(spark)
    val text = graft.ingest.TextExtract.extract(pages)
    val mentions = graft.listings.ListingExtract.mentions(text)
    val dict = graft.link.AliasLink.buildDict(seeds.aliases)
    val (linked, _) = graft.link.AliasLink.link(mentions, dict)
    linked.explain("formatted")
  }
}
