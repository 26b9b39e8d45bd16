package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is one-shot batch
  * (SURVEY.md §2.10), so streaming here serves the training-data-pipeline
  * side: the same transform function runs in batch (oracle-checked) and as a
  * readStream→writeStream query (tested with the memory sink). */
object Streams {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** 5-minute tumbling-window counts — identical logic for batch and
    * streaming inputs (the window key is computed as epoch-seconds so the
    * batch form hashes identically in DuckDB). */
  def windowedCounts(events: DataFrame): DataFrame = {
    val winStart = (unix_timestamp(col("ts")) -
      unix_timestamp(col("ts")) % 300).as("window_start")
    events.groupBy(winStart, col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
  }

  val windowedCountsSql: String =
    """SELECT CAST(floor(epoch(ts)) AS BIGINT)
         - CAST(floor(epoch(ts)) AS BIGINT) % 300 AS window_start,
       event_type, count(*) AS n, round(sum(value), 6) AS sum_value
       FROM events GROUP BY 1, 2"""

  /** Sessionization (30-min inactivity gap) expressed with lag+running-sum
    * windows — the batch-checkable equivalent of
    * mapGroupsWithState session tracking. Output: per user, session count
    * and longest session (seconds). */
  def sessionize(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sessions = events
      .withColumn("prev_ts", lag("ts", 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800,
             1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    sessions.groupBy("user_id", "session_id")
      .agg((max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts"))))
             .as("dur_s"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), max("dur_s").as("max_dur_s"))
  }

  val sessionizeSql: String =
    """WITH s AS (SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR CAST(floor(epoch(ts)) AS BIGINT) -
                   CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_session
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sid AS (SELECT *, sum(new_session) OVER
         (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_id FROM s),
       durs AS (SELECT user_id, session_id,
         max(CAST(floor(epoch(ts)) AS BIGINT)) -
         min(CAST(floor(epoch(ts)) AS BIGINT)) AS dur_s
         FROM sid GROUP BY 1,2)
       SELECT user_id, count(*) AS n_sessions, max(dur_s) AS max_dur_s
       FROM durs GROUP BY 1"""

  /** Streaming form of [[windowedCounts]] with watermark + event-time window
    * (used by the streaming spec via the memory sink). */
  def streamingWindowedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .parquet(dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n"), col("sum_value"))

  /** Streaming INGEST dedup — the training-pipeline op every streaming
    * crawl front-end needs: drop re-crawled/duplicated documents by
    * content key as they arrive. Batch form below is the oracle-checkable
    * twin (first event per (event_type, value-bucket) key in event-time
    * order, deterministic tie-break). */
  def dedupBatch(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type", "k")
      .orderBy(col("ts").asc, col("event_id").asc)
    // sign-preserving % (not pmod): matches the DuckDB oracle's `%` for
    // negative user_id too (latent divergence flagged in round-2 ADVICE)
    events.select(col("event_id"), col("ts"), col("event_type"),
                  (col("user_id") % 100).as("k"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("event_id"), col("event_type"), col("k"))
  }

  val dedupBatchSql: String =
    """SELECT event_id, event_type, k FROM (
         SELECT event_id, event_type, user_id % 100 AS k,
           row_number() OVER (PARTITION BY event_type, user_id % 100
                              ORDER BY ts ASC, event_id ASC) AS rn
         FROM events) WHERE rn = 1"""

  /** Stream-stream WATERMARKED JOIN (r2 stretch): attribute each view to
    * the same user's clicks within the next 12 hours — the classic
    * event-attribution join. This batch form is the DuckDB-checkable twin
    * (one range-predicated join); [[streamingAttributionJoin]] is the
    * stream-stream form whose state Spark bounds from the two watermarks
    * plus the time-range condition. */
  def attributionJoinBatch(events: DataFrame): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
              col("event_id").as("view_id"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
    views.join(clicks,
        col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 12 HOURS"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  val attributionJoinSql: String =
    """WITH v AS (SELECT user_id, ts AS view_ts, event_id AS view_id
                  FROM events WHERE event_type = 'view'),
       c AS (SELECT user_id, ts AS click_ts, event_id AS click_id
             FROM events WHERE event_type = 'click')
       SELECT v.user_id, view_id, click_id
       FROM v JOIN c ON v.user_id = c.user_id
        AND click_ts >= view_ts
        AND click_ts <= view_ts + INTERVAL 12 HOUR"""

  /** The stream-stream twin: both sides are streams, watermarked so the
    * join state is DROPPABLE — a click matches views at most 12 h older,
    * so view-side state older than watermark(click) − 12 h dies; at ingest
    * scale state is bounded by rate × horizon, not by history. Inner join
    * ⇒ results are emitted as matched; streaming ≡ batch asserted in
    * StatefulSpec. */
  def streamingAttributionJoin(spark: SparkSession, dir: String): DataFrame = {
    val views = spark.readStream.schema(eventsSchema).parquet(dir)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
              col("event_id").as("view_id"))
      .withWatermark("view_ts", "1 hour")
    val clicks = spark.readStream.schema(eventsSchema).parquet(dir)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user_id"), col("ts").as("click_ts"),
              col("event_id").as("click_id"))
      .withWatermark("click_ts", "13 hours")
    views.join(clicks,
        col("user_id") === col("c_user_id") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 12 HOURS"))
      .select(col("user_id"), col("view_id"), col("click_id"))
  }

  /** The streaming twin: `dropDuplicatesWithinWatermark` on the same key —
    * state is bounded by the watermark horizon (the property that lets
    * this run forever at ingest scale; an unbounded dropDuplicates would
    * accumulate one state row per key ever seen). Streaming ≡ batch on
    * replays ordered within the watermark (asserted in StatefulSpec). */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventsSchema)
      .parquet(dir)
      .withColumn("k", col("user_id") % 100) // same % semantics as the batch twin
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_type", "k")
      .select(col("event_id"), col("event_type"), col("k"))
}
