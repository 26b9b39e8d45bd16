package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Disposable stage-cost probe for optimization work (not part of the
  * driver contract; safe to delete). */
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-scratch")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f"); r
    }
    // warm the scan
    t("warm-docs")(graft.core.Tables.documents(spark, sfDir).count())
    (1 to 2).foreach { _ =>
      val sh = t("sh-checkpoint")(Dedup.shingles(spark, sfDir).localCheckpoint())
      t("sh-count")(sh.count())
      val rare = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= Dedup.RareDf).select("shingle")
      t("rare-count")(rare.count())
      val shr = sh.join(rare, "shingle")
      val cand = shr.select(col("doc_id").as("a"), col("shingle"))
        .join(shr.select(col("doc_id").as("b"), col("shingle")), "shingle")
        .filter(col("a") < col("b"))
        .select("a", "b").distinct()
      val candCp = t("cand-distinct")(cand.localCheckpoint())
      println("cand rows " + candCp.count())
      val sets = t("sets-checkpoint")(sh.groupBy("doc_id")
        .agg(sort_array(collect_set("shingle")).as("shs"))
        .withColumn("n", size(col("shs")))
        .localCheckpoint())
      t("verify-join") {
        candCp
          .join(sets.select(col("doc_id").as("a"), col("shs").as("sa"),
                            col("n").as("na")), "a")
          .join(sets.select(col("doc_id").as("b"), col("shs").as("sb"),
                            col("n").as("nb")), "b")
          .withColumn("c", size(array_intersect(col("sa"), col("sb"))))
          .withColumn("jac", col("c") / (col("na") + col("nb") - col("c")))
          .filter(col("jac") >= 0.5).count()
      }
    }
    spark.stop()
  }
}
