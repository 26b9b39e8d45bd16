package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for selected driver-contract queries —
  * the .explain audit loop (pushdown, pruning, broadcast, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("f1_prefilter", "j1_broadcast_dim_join",
                         "w1_topk_per_group", "dedup_exact",
                         "text_fingerprint", "a7_rule_mining_stats")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, sf).explain("formatted")
    }
    spark.stop()
  }
}
