package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the rule miners' share-qualification (VERDICT r4 #1):
  * times the shipped single-scan collect_set form against the retired
  * two-aggregate + join-back form on a REAL subject_listings checkpoint
  * (same window, same JVM, alternating order), and cross-checks the two
  * produce identical rule sets. args: subjectListingsPath [repeats]. */
object RuleMineAb {

  private val MinShare = graft.taxonomy.RuleMining.MinShare
  private val MinSupport = graft.taxonomy.RuleMining.MinSupport

  /** The retired r4 form: the subject×seed join is aggregated twice
    * (totals + per-value counts) and joined back. */
  private def doubleScan(linked: DataFrame, groupKeys: Seq[String],
                         valCol: String): DataFrame = {
    val totals = linked.groupBy(groupKeys.map(col): _*)
      .agg(countDistinct("ent").as("total"))
    val cnts = linked.groupBy((groupKeys :+ valCol).map(col): _*)
      .agg(countDistinct("ent").as("cnt"))
    cnts.join(totals, groupKeys)
      .filter(col("cnt") >= MinSupport &&
              col("cnt") / col("total") >= MinShare)
      .select((groupKeys :+ valCol).map(col): _*)
  }

  def main(args: Array[String]): Unit = {
    val slPath = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val world = graft.testkit.CorpusGen.World(nCountries = 250,
                                              knownPerListing = 12)
    val seeds = world.seeds(spark)
    val seedTypes = seeds.entityTypes.select(col("ent"), col("tpe"))
    val sl = spark.read.parquet(slPath)
    println(s"subject_listings rows=${sl.count()}")
    def joined = sl.select("url", "listing_key", "ent").join(seedTypes, "ent")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); force(f); (System.nanoTime() - t0) / 1e9
    }

    // identity check first (also warms caches for both shapes)
    val a = graft.taxonomy.RuleMining.listingTypeRules(sl, seedTypes)
    val b = doubleScan(joined, Seq("url", "listing_key"), "tpe")
    val diff = a.join(b, Seq("url", "listing_key", "tpe"), "left_anti").count() +
      b.join(a, Seq("url", "listing_key", "tpe"), "left_anti").count()
    require(diff == 0, s"rule sets differ: $diff")
    println(s"identity ok, rules=${a.count()}")

    // alternate the order so window drift cannot favor one shape
    val (tA, tB) = (Array.newBuilder[Double], Array.newBuilder[Double])
    for (i <- 1 to repeats) {
      if (i % 2 == 1) {
        tA += time(graft.taxonomy.RuleMining.listingTypeRules(sl, seedTypes))
        tB += time(doubleScan(joined, Seq("url", "listing_key"), "tpe"))
      } else {
        tB += time(doubleScan(joined, Seq("url", "listing_key"), "tpe"))
        tA += time(graft.taxonomy.RuleMining.listingTypeRules(sl, seedTypes))
      }
    }
    val (ra, rb) = (tA.result(), tB.result())
    println(f"AB single_scan best=${ra.min}%.2f all=${ra.mkString(",")}")
    println(f"AB double_scan best=${rb.min}%.2f all=${rb.mkString(",")}")
    println(f"AB speedup=${rb.min / ra.min}%.2f")
    spark.stop()
  }
}
