package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B probe for the round-5 pair-stage trims: (1) the hoisted-norm cosine
  * in `Dedup.embeddingCosineIvf` (norms once per vector instead of three
  * array passes per pair) and (2) the shared pinned shingle frame in
  * `Dedup.minhashLshFastContainment` (one explode instead of three). Each
  * shipped form is timed against its retired twin on the real tables —
  * same window, same JVM, alternating order — and checked for EXACT result
  * identity (full-row set equality, cos values bit-compared through the
  * round(…,6) contract column). args: sfDir [repeats].
  */
object CosineAb {

  /** Retired twin of embeddingCosineIvf: per-pair norms (three aggregate
    * passes per candidate pair). */
  private def ivfPerPair(s: SparkSession, d: String): DataFrame = {
    import graft.core.Tables
    def dotC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    def cosC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      dotC(a, b) / (sqrt(dotC(a, a)) * sqrt(dotC(b, b)))
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"),
              transform(col("embedding"), x => x.cast("double")).as("emb"))
    val cents = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("emb").as("ce"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(col("ccos").desc, col("cent_id").asc)
    val assigned = e.join(broadcast(cents))
      .withColumn("ccos", cosC(col("emb"), col("ce")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= 1)
      .select(col("vec_id"), col("emb"), col("cent_id").as("cell"))
    assigned.select(col("vec_id").as("a"), col("emb").as("ea"), col("cell"))
      .join(assigned.select(col("vec_id").as("b"), col("emb").as("eb"),
                            col("cell")), "cell")
      .filter(col("a") < col("b"))
      .dropDuplicates("a", "b")
      .withColumn("cos", cosC(col("ea"), col("eb")))
      .filter(col("cos") >= 0.35)
      .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
  }

  /** Retired twin of minhashLshFastContainment: two independent
    * shingle scans (exact path re-explodes for candidates AND verify sets;
    * fast path explodes a third time). */
  private def containmentUnpinned(s: SparkSession, d: String): DataFrame =
    graft.ops.Dedup.minhashLsh(s, d)
      .join(graft.ops.Dedup.minhashLshFast(s, d), Seq("a", "b"), "left_semi")

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
    def identical(x: DataFrame, y: DataFrame, cols: Seq[String]): Unit = {
      val d1 = x.join(y, cols, "left_anti").count()
      val d2 = y.join(x, cols, "left_anti").count()
      require(d1 + d2 == 0, s"results differ: $d1 + $d2 rows")
    }

    def ab(name: String, shipped: => DataFrame, twin: => DataFrame,
           idCols: Seq[String]): Unit = {
      identical(shipped, twin, idCols)
      println(s"[$name] identity ok, rows=${shipped.count()}")
      var ts = List.empty[Double]; var tt = List.empty[Double]
      for (i <- 1 to repeats) {
        if (i % 2 == 1) { ts ::= time(shipped); tt ::= time(twin) }
        else { tt ::= time(twin); ts ::= time(shipped) }
      }
      println(f"[$name] shipped best=${ts.min}%.3f all=${ts.reverse.map(t => f"$t%.2f").mkString(",")}")
      println(f"[$name] twin    best=${tt.min}%.3f all=${tt.reverse.map(t => f"$t%.2f").mkString(",")}")
      println(f"[$name] speedup(best) ${tt.min / ts.min}%.2fx")
    }

    ab("ivf_cosine",
       graft.ops.Dedup.embeddingCosineIvf(spark, sfDir),
       ivfPerPair(spark, sfDir), Seq("a", "b", "cos"))
    ab("minhash_containment",
       graft.ops.Dedup.minhashLshFastContainment(spark, sfDir),
       containmentUnpinned(spark, sfDir), Seq("a", "b", "jac"))
    spark.stop()
  }
}
