package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Co-located joins via bucketing: both sides bucketed by the join key →
  * sort-merge join with NO shuffle exchange. The pattern for the engine's
  * recurring big-big joins at 100 TB (e.g. mentions ⋈ per-url side tables
  * bucketed by url): pay the shuffle once at write time, reuse it across
  * every downstream join. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val sf = "/root/testdata/sf0.001"
    // disable broadcast so the planner must pick SMJ (the big-big case)
    val oldThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      graft.core.Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
      graft.core.Tables.lineitem(spark, sf)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val exchangesBelowJoin = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the only exchange allowed is the one for the final groupBy — the
      // JOIN itself must be shuffle-free (bucket-co-located)
      assert(exchangesBelowJoin.size <= 1,
             joined.queryExecution.executedPlan.toString)
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThr)
      spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
