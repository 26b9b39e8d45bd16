package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Relational operator library over the driver testdata tables.
  *
  * Each query re-expresses one operator family from SURVEY.md §2 (reference
  * citations inline) as a declarative DataFrame plan so Catalyst gets full
  * pushdown/pruning/codegen. Numeric outputs are rounded and cast so the
  * DuckDB oracle hashes identically (sum→double, count→long, round(_,6)).
  */
object Relational {

  /** S9 stats report (serialize.py:345-396): grouped aggregate rollup.
    * Partial (map-side) aggregation is free via hash-agg; no extra shuffle
    * beyond the single groupBy. */
  def statsReport(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 6).as("sum_qty"),
        round(avg("l_extendedprice"), 6).as("avg_price"),
        countDistinct("l_orderkey").as("n_orders"))

  /** F1 listing-indicator prefilter (page_parser.py:179,226): cheap predicate
    * BEFORE any expensive extraction; pushed into the parquet scan. */
  def prefilter(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("lang") === "en" && col("text").contains("spark"))
      .select(col("doc_id"), col("n_chars"))

  /** F8 mention-label validity (page_parser.py:436, mention_detection:111):
    * length>2 && not all-digits. */
  def labelValidity(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"))
      .filter(length(col("p_name")) > 2 && !col("p_name").rlike("^[0-9]+$"))

  /** J1 broadcast alias-dictionary join (resource.py:180-194 probe at
    * cat2ax.py:148): small dimension side broadcast — no shuffle of the fact
    * table. */
  def broadcastDimJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           round(sum("o_totalprice"), 4).as("revenue"))

  /** J2 spelling-redirect resolution (resource.py:290-305): self-join on an
    * 8-char prefix block guarded by levenshtein<=2 (built-in, codegen'd).
    *
    * Skew handling: with near-sequential names one prefix block holds the
    * whole table, so a naive equi-join runs the entire O(g²) comparison in
    * ONE task. The self-join is triangle-SALTED instead: each side is
    * replicated s ways keyed by (block, salt_a, salt_b), so every pair lands
    * in exactly one of s² balanced tasks. Same result set (salting is
    * physical, the DuckDB oracle is the unsalted semantics), wall-clock
    * drops by ~min(s², cores). */
  def levenshteinPairs(s: SparkSession, d: String): DataFrame = {
    val S = 8
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"),
              substring(col("s_name"), 1, 8).as("block"),
              pmod(xxhash64(col("s_suppkey")), lit(S)).cast("int").as("salt"))
    val a = sup.select(col("key").as("a_key"), col("name").as("a_name"),
                       col("block"), col("salt").as("salt_a"))
      .withColumn("salt_b", explode(sequence(lit(0), lit(S - 1))))
    val b = sup.select(col("key").as("b_key"), col("name").as("b_name"),
                       col("block"), col("salt").as("salt_b"))
      .withColumn("salt_a", explode(sequence(lit(0), lit(S - 1))))
    a.join(b, Seq("block", "salt_a", "salt_b"))
      .filter(col("a_key") < col("b_key") &&
              levenshtein(col("a_name"), col("b_name")) <= 2)
      .select("a_key", "b_key")
  }

  /** J7 new-relations anti-join (extract.py:286-289): keep only rows absent
    * from the existing KG. */
  def antiJoinNew(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_totalprice") > 150000),
            col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")

  /** J9 lexical-key equi-join (matching/lexical.py:22-96): normalize to the
    * alias key (lower → alphanumeric squash) then group. The normalization is
    * a pure Catalyst expression chain — stays inside whole-stage codegen. */
  def lexicalKeyGroup(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(regexp_replace(lower(col("p_type")), "[^a-z0-9]", "").as("lex_key"))
      .groupBy("lex_key")
      .agg(count(lit(1)).as("n_parts"))

  /** A2 surface-form reference frequencies (resource.py:180-194): count per
    * (alias,entity), window-normalize to P(ent|alias). */
  def surfaceFormFreq(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("event_type"), (col("user_id") % 10).as("user_bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    counts
      .withColumn("freq", round(col("cnt") / sum("cnt").over(w), 6))
      .select("event_type", "user_bucket", "cnt", "freq")
  }

  /** A3 exact median aggregation (cat2ax.py:100-139): per-group exact median
    * (Spark `median` = interpolated 0.5-percentile, matching DuckDB). */
  def medianAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(round(median(col("l_quantity")), 6).as("med_qty"),
           round(median(col("l_extendedprice")), 6).as("med_price"))

  /** A7 two-level rule mining with the reference's bespoke micro_std
    * (extract.py:90-139): level 1 = per-(flag,order) confidence; level 2 =
    * micro mean via sums, macro mean via confidence average, micro_std =
    * mean ABSOLUTE deviation from the micro mean (NOT stddev — the algebra at
    * extract.py:135-138 is reproduced exactly; see taxonomy.RuleMining for
    * the KG-side version with zero-filling). */
  def ruleMiningStats(s: SparkSession, d: String): DataFrame = {
    val lvl1 = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_orderkey")
      .agg(sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("hit_cnt"),
           count(lit(1)).as("cnt"))
      .withColumn("conf", col("hit_cnt") / col("cnt"))
    val micro = lvl1.groupBy("l_returnflag")
      .agg((sum("hit_cnt") / sum("cnt")).as("micro_mean_raw"),
           avg("conf").as("macro_mean_raw"))
    lvl1.join(micro, "l_returnflag")
      .groupBy("l_returnflag")
      .agg(round(first("micro_mean_raw"), 6).as("micro_mean"),
           round(first("macro_mean_raw"), 6).as("macro_mean"),
           round(avg(abs(col("conf") - col("micro_mean_raw"))), 6).as("micro_std"),
           countDistinct("l_orderkey").as("group_count"))
  }

  /** A12 functional-predicate detection (heuristics.py:168-184): predicate is
    * functional when >=95% of subjects have exactly one object. */
  def functionalPredicate(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy("event_type", "user_id")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("event_type")
      .agg(round(avg(when(col("cnt") > 1, 1.0).otherwise(0.0)), 6)
             .as("multi_share"))
      .withColumn("functional", col("multi_share") <= 0.05)

  /** A14 majority / most_common(1) with share (entity.py:121,
    * greedy_clustering.py:118-127): window argmax with a DETERMINISTIC
    * tie-break (count desc, then value asc) — parallelism-invariant. */
  def majorityWithShare(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("event_type").asc)
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("share",
        round(col("cnt") / sum("cnt").over(Window.partitionBy("user_id")), 6))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("majority_type"),
              col("cnt"), col("share"))
  }

  /** A16 entity popularity = in-degree + out-degree (matching/graph.py:17-25):
    * union of both directions, single aggregate. */
  def degreePopularity(s: SparkSession, d: String): DataFrame = {
    val out = Tables.customer(s, d)
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val in = Tables.supplier(s, d)
      .select(col("s_nationkey").cast("int").as("nationkey"))
    out.unionByName(in).groupBy("nationkey")
      .agg(count(lit(1)).as("degree"))
  }

  /** W1 top-k per group (lexical.py:79-89): window row_number <= k with a
    * total order (price desc, linenumber asc) for determinism. */
  def topKPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
  }

  /** A10 domain/range heuristic (dbpedia/heuristics.py:12-62): per predicate,
    * argmax type share above a threshold. */
  def domainRangeHeuristic(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.events(s, d)
      .groupBy(col("event_type"), (col("user_id") % 5).as("type_bucket"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type")
    val ranked = counts
      .withColumn("share", col("cnt") / sum("cnt").over(w))
      .withColumn("rn", row_number().over(
        w.orderBy(col("cnt").desc, col("type_bucket").asc)))
    ranked.filter(col("rn") === 1 && col("share") >= 0.15)
      .select(col("event_type"), col("type_bucket").as("top_bucket"),
              round(col("share"), 6).as("share"))
  }

  /** U1+U2 set ops (extract.py:63-64; ontology.py:145-147): union of two
    * branches then set-difference via left_anti. */
  def setDifference(s: SparkSession, d: String): DataFrame = {
    val sold = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      .select(col("l_partkey").as("p_partkey")).distinct()
    Tables.part(s, d)
      .join(sold, Seq("p_partkey"), "left_anti")
      .select("p_partkey", "p_name")
  }

  /** G2 transitive closure (base_graph.py:76-83) as an iterative join
    * fixpoint over an edge table (customer→nation→region, tagged node ids).
    * Each round doubles reachable path length; terminates when no new pairs.
    * At taxonomy scale (<=10^6 edges) this is a handful of shuffles;
    * `localCheckpoint` would truncate lineage on deeper graphs. */
  def typeClosure(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(
      concat(lit("c"), col("c_custkey")).as("node"),
      concat(lit("n"), col("c_nationkey")).as("anc"))
    val nr = Tables.nation(s, d).select(
      concat(lit("n"), col("n_nationkey")).as("node"),
      concat(lit("r"), col("n_regionkey")).as("anc"))
    val edges = cn.unionByName(nr)
    graft.taxonomy.Closure.transitiveClosure(edges)
  }

  /** G9 connected components (greedy_clustering.py:37-39) over a bipartite
    * order—part graph, via alternating large-star/small-star DataFrame
    * self-joins (see canonical.ConnectedComponents). Output: (node,
    * component=min node id in component) — deterministic, order-free. */
  def connectedComponents(s: SparkSession, d: String): DataFrame = {
    val edges = Tables.lineitem(s, d)
      .filter(col("l_partkey") <= 20)
      .select(concat(lit("o"), col("l_orderkey")).as("src"),
              concat(lit("p"), col("l_partkey")).as("dst"))
      .distinct()
    graft.canonical.ConnectedComponents.run(edges)
  }

  /** A17 at corpus scale: distributed clustering evaluation
    * ([[graft.emit.ClusterMetrics.evaluateDf]] — purity/NMI/ARI + B³ from
    * ONE contingency-table shuffle) scoring a synthetic system clustering
    * (vec_id mod 8) against the embeddings table's labels as gold. The
    * driver-side [[graft.emit.ClusterMetrics.evaluate]] twin is asserted
    * equal in ClusterMetricsSpec; this row pins the distributed algebra
    * against DuckDB. */
  def clusteringEval(s: SparkSession, d: String): DataFrame =
    graft.emit.ClusterMetrics.evaluateDf(
      Tables.embeddings(s, d).select(
        pmod(col("vec_id"), lit(8)).cast("string").as("pred"),
        col("label").as("gold")))

  val clusteringEvalSql: String =
    """WITH a AS (SELECT CAST(vec_id % 8 AS VARCHAR) AS pred, label AS gold
                  FROM embeddings),
       joint AS (SELECT pred, gold, CAST(count(*) AS DOUBLE) AS n_sg
                 FROM a GROUP BY 1, 2),
       preds AS (SELECT pred, sum(n_sg) AS n_s, max(n_sg) AS max_sg
                 FROM joint GROUP BY 1),
       golds AS (SELECT gold, sum(n_sg) AS n_g FROM joint GROUP BY 1),
       tot AS (SELECT sum(n_sg) AS n FROM joint),
       jr AS (SELECT
           sum(n_sg / n * ln(n_sg * n / (n_s * n_g))) AS mi,
           sum(n_sg * n_sg / n_s / n) AS bcubed_p,
           sum(n_sg * n_sg / n_g / n) AS bcubed_r,
           sum(n_sg * (n_sg - 1) / 2.0) AS sum_ij
         FROM joint
           JOIN preds ON joint.pred IS NOT DISTINCT FROM preds.pred
           JOIN golds ON joint.gold IS NOT DISTINCT FROM golds.gold, tot),
       pr AS (SELECT sum(max_sg) / max(n) AS purity,
           sum(-(n_s / n) * ln(n_s / n)) AS h_p,
           sum(n_s * (n_s - 1) / 2.0) AS sum_a
         FROM preds, tot),
       gr AS (SELECT sum(-(n_g / n) * ln(n_g / n)) AS h_g,
           sum(n_g * (n_g - 1) / 2.0) AS sum_b
         FROM golds, tot)
       SELECT CAST(n AS BIGINT) AS n_items,
         round(purity, 6) AS purity,
         round(CASE WHEN h_p = 0 AND h_g = 0 THEN 1.0
                    WHEN h_p = 0 OR h_g = 0 THEN 0.0
                    ELSE 2.0 * mi / (h_p + h_g) END, 6) AS nmi,
         round(CASE WHEN n * (n - 1) / 2.0 = 0 THEN 1.0
                    WHEN (sum_a + sum_b) / 2.0
                         = sum_a * sum_b / (n * (n - 1) / 2.0) THEN 1.0
                    ELSE (sum_ij - sum_a * sum_b / (n * (n - 1) / 2.0))
                         / ((sum_a + sum_b) / 2.0
                            - sum_a * sum_b / (n * (n - 1) / 2.0)) END, 6)
           AS ari,
         round(bcubed_p, 6) AS bcubed_p,
         round(bcubed_r, 6) AS bcubed_r,
         round(2.0 * bcubed_p * bcubed_r / (bcubed_p + bcubed_r), 6)
           AS bcubed_f
       FROM jr, pr, gr, tot"""
}
