package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the shingle pin in `Dedup.ngramJaccard`: times the shipped
  * pinned-shingles form against the unpinned form (the explode re-evaluated
  * by each of its three consumers) on the real `documents` table — same
  * window, same JVM, alternating order — and cross-checks identical pair
  * sets. args: sfDir [repeats]. */
object JaccardAb {

  /** The unpinned twin of [[graft.ops.Dedup.ngramJaccard]]: identical
    * operator chain, no localCheckpoint on the exploded shingles. */
  private def unpinned(s: SparkSession, d: String): DataFrame = {
    val sh = graft.ops.Dedup.shingles(s, d)
    val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= graft.ops.Dedup.RareDf).select("shingle")
    val shr = sh.join(rare, "shingle")
    val cand = shr.select(col("doc_id").as("a"), col("shingle"))
      .join(shr.select(col("doc_id").as("b"), col("shingle")), "shingle")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    val sets = sh.groupBy("doc_id")
      .agg(sort_array(collect_set("shingle")).as("shs"))
      .withColumn("n", size(col("shs")))
    cand
      .join(sets.select(col("doc_id").as("a"), col("shs").as("sa"),
                        col("n").as("na")), "a")
      .join(sets.select(col("doc_id").as("b"), col("shs").as("sb"),
                        col("n").as("nb")), "b")
      .withColumn("c", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jac", col("c") / (col("na") + col("nb") - col("c")))
      .filter(col("jac") >= 0.5)
      .select(col("a"), col("b"), round(col("jac"), 6).as("jac"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val repeats = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def force(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime(); force(f); (System.nanoTime() - t0) / 1e9
    }

    val a = graft.ops.Dedup.ngramJaccard(spark, sfDir)
    val b = unpinned(spark, sfDir)
    val diff = a.join(b, Seq("a", "b"), "left_anti").count() +
      b.join(a, Seq("a", "b"), "left_anti").count()
    require(diff == 0, s"pair sets differ: $diff")
    println(s"identity ok, pairs=${a.count()}")

    var tp = List.empty[Double]; var tu = List.empty[Double]
    for (i <- 1 to repeats) {
      if (i % 2 == 1) {
        tp ::= time(graft.ops.Dedup.ngramJaccard(spark, sfDir))
        tu ::= time(unpinned(spark, sfDir))
      } else {
        tu ::= time(unpinned(spark, sfDir))
        tp ::= time(graft.ops.Dedup.ngramJaccard(spark, sfDir))
      }
    }
    println(f"pinned   best=${tp.min}%.3f all=${tp.reverse.map(t => f"$t%.2f").mkString(",")}")
    println(f"unpinned best=${tu.min}%.3f all=${tu.reverse.map(t => f"$t%.2f").mkString(",")}")
    println(f"speedup(best) ${tu.min / tp.min}%.2fx")
    spark.stop()
  }
}
