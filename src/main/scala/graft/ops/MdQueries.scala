package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.emit.MdMetrics

/** Driver-contract query for the MD span-schema evaluator
  * ([[graft.emit.MdMetrics]] ≙ the reference's `SETagsEvaluator`,
  * `mention_detection/evaluation/metrics.py:12-139`): deterministic
  * pred/gold span fixtures generated from `orders`, classified by the
  * REAL evaluator on the Spark side and by an independent SQL transcription
  * of the scenario rules on the DuckDB side.
  *
  * Per order key k, gold = {(t(k%3), 0, 3), (t((k+1)%3), 5, 8)} and the
  * two predictions cycle through the scenarios with m = k % 6:
  *   m=0  both exact matches                       → I, I
  *   m=1  exact offsets, wrong type (both)         → IV, IV
  *   m=2  overlap same type + a pred overlapping BOTH golds (the
  *        first-gold-in-sorted-order rule decides: VI vs g1) → V, VI, 1 missed
  *   m=3  overlap same type on g2 + spurious       → V, II, 1 missed
  *   m=4  two spurious                             → II, II, 2 missed
  *   m=5  ZERO-LENGTH pred (ta,1,1) inside g1 + exact on g2 — the empty
  *        range must NOT overlap (reference range-set semantics):
  *        → II, I, 1 missed (a V here means the overlap test lost its
  *        non-emptiness terms)
  */
object MdQueries {

  def mdSpanEval(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderkey").cast("string").as("example"),
      when(col("o_orderkey") % 2 === 0, "enum").otherwise("table")
        .as("listing_type"),
      (col("o_orderkey") % 6).as("m"),
      concat(lit("t"), col("o_orderkey") % 3).as("ta"),
      concat(lit("t"), (col("o_orderkey") + 1) % 3).as("tb"))
    def span(tag: Column, st: Column, en: Column): Column =
      struct(tag.as("tag"), st.cast("int").as("start"), en.cast("int").as("end"))
    val m = col("m")
    val gold = base.select(col("example"), col("listing_type"),
      explode(array(span(col("ta"), lit(0), lit(3)),
                    span(col("tb"), lit(5), lit(8)))).as("sp"))
    val pred = base.select(col("example"), col("listing_type"),
      explode(array(
        span(when(m === 1, lit("zz")).when(m === 3, col("tb"))
               .when(m === 4, lit("zz")).otherwise(col("ta")),
             when(m === 2, lit(1)).when(m === 3, lit(6))
               .when(m === 4, lit(20)).when(m === 5, lit(1)).otherwise(lit(0)),
             when(m === 2, lit(4)).when(m === 3, lit(9))
               .when(m === 4, lit(23)).when(m === 5, lit(1)).otherwise(lit(3))),
        span(when(m === 1, col("ta"))
               .when(m === 3 || m === 4, lit("zz"))
               .otherwise(col("tb")),
             when(m === 2, lit(2)).when(m === 3, lit(20))
               .when(m === 4, lit(30)).otherwise(lit(5)),
             when(m === 2, lit(6)).when(m === 3, lit(22))
               .when(m === 4, lit(33)).otherwise(lit(8))))).as("sp"))
    def flat(df: DataFrame) =
      df.select(col("example"), col("listing_type"), col("sp.tag").as("tag"),
                col("sp.start").as("start"), col("sp.end").as("end"))
    MdMetrics.evaluate(flat(pred), flat(gold))
  }

  /** The gold-TSV evaluation wiring (≙ the reference's eval harness,
    * `mention_detection/evaluation/__init__.py:47-52`, over the engine's
    * heuristic scorer — the M2 substitution): gold rows are the S5 TSV
    * ([[graft.sources.GoldStandard.readMentionGold]]); gold spans locate
    * the `link` text inside the raw item `example`, tagged by the gold
    * `label`; pred spans are the detected mentions of the same page whose
    * label occurs in that item, tagged by the heuristic shape tag (the
    * engine's M2 label space). A gold item the scorer produced no mention
    * for counts missed; a detected mention sitting in a gold item beside
    * the link counts spurious.
    *
    * Shape: gold is eval-sized; the only corpus-side touch is one
    * url-keyed join against the mention table (broadcast — gold side is
    * tiny), then everything is row-local + [[MdMetrics.evaluate]]. */
  def mdGoldEval(mentions: DataFrame, mdGold: DataFrame): DataFrame = {
    val s = mentions.sparkSession
    import s.implicits._
    val gold = mdGold.select(
      col("page_url"),
      concat_ws("#", col("page_url"), col("listing_id"), col("example"))
        .as("example"),
      col("listing_type"), col("label").as("gtag"), col("link"),
      col("example").as("txt"))
    val goldSpans = gold
      .select(col("example"), col("listing_type"), col("gtag"), col("link"),
              col("txt"))
      .as[(String, String, String, String, String)]
      .flatMap { case (ex, lt, tag, link, txt) =>
        MdMetrics.locateTokens(txt, link).map {
          case (st, en) => (ex, lt, tag, st, en)
        }
      }.toDF("example", "listing_type", "tag", "start", "end")
    val pageMentions = mentions
      .join(broadcast(gold.select(col("page_url").as("url")).distinct()),
            Seq("url"), "left_semi")
      .select(col("url").as("page_url"), col("label")).distinct()
    val predSpans = gold.join(pageMentions, Seq("page_url"))
      .withColumn("ptag", graft.taxonomy.ValidTags.shapeTag(col("label")))
      .select(col("example"), col("listing_type"), col("ptag"), col("label"),
              col("txt"))
      .as[(String, String, String, String, String)]
      .flatMap { case (ex, lt, tag, label, txt) =>
        MdMetrics.locateTokens(txt, label).map {
          case (st, en) => (ex, lt, tag, st, en)
        }
      }.toDF("example", "listing_type", "tag", "start", "end")
    MdMetrics.evaluate(predSpans, goldSpans)
  }

  /** Independent SQL transcription of the SETagsEvaluator scenario rules:
    * scenario I = exact tuple hit; otherwise the FIRST gold in
    * (start, end, tag) order satisfying exact-offsets-wrong-type OR range
    * overlap decides IV/V/VI; no such gold = spurious; golds never chosen
    * by any pred = missed. P/R per schema as in metrics.py:120-139. */
  val mdSpanEvalSql: String =
    """WITH o AS (SELECT o_orderkey AS k,
              CAST(o_orderkey AS VARCHAR) AS example,
              CASE WHEN o_orderkey % 2 = 0 THEN 'enum' ELSE 'table' END AS lt,
              o_orderkey % 6 AS m,
              't' || (o_orderkey % 3) AS ta,
              't' || ((o_orderkey + 1) % 3) AS tb
       FROM orders),
      goldd AS (
        SELECT DISTINCT * FROM (
          SELECT example, lt, ta AS tag, 0 AS s, 3 AS e FROM o
          UNION ALL SELECT example, lt, tb, 5, 8 FROM o)),
      predd AS (
        SELECT DISTINCT * FROM (
          SELECT example, lt,
            CASE m WHEN 1 THEN 'zz' WHEN 3 THEN tb WHEN 4 THEN 'zz' ELSE ta END AS tag,
            CASE m WHEN 2 THEN 1 WHEN 3 THEN 6 WHEN 4 THEN 20 WHEN 5 THEN 1 ELSE 0 END AS s,
            CASE m WHEN 2 THEN 4 WHEN 3 THEN 9 WHEN 4 THEN 23 WHEN 5 THEN 1 ELSE 3 END AS e
          FROM o
          UNION ALL
          SELECT example, lt,
            CASE m WHEN 1 THEN ta WHEN 3 THEN 'zz' WHEN 4 THEN 'zz' ELSE tb END,
            CASE m WHEN 2 THEN 2 WHEN 3 THEN 20 WHEN 4 THEN 30 ELSE 5 END,
            CASE m WHEN 2 THEN 6 WHEN 3 THEN 22 WHEN 4 THEN 33 ELSE 8 END
          FROM o)),
      exact AS (SELECT p.* FROM predd p WHERE EXISTS (
          SELECT 1 FROM goldd g WHERE g.example = p.example
            AND g.s = p.s AND g.e = p.e AND g.tag = p.tag)),
      rest AS (SELECT p.* FROM predd p WHERE NOT EXISTS (
          SELECT 1 FROM goldd g WHERE g.example = p.example
            AND g.s = p.s AND g.e = p.e AND g.tag = p.tag)),
      matches AS (
        SELECT p.example, p.lt, p.tag AS ptag, p.s AS ps, p.e AS pe,
               g.tag AS gtag, g.s AS gs, g.e AS ge,
               row_number() OVER (PARTITION BY p.example, p.tag, p.s, p.e
                                  ORDER BY g.s, g.e, g.tag) AS rn
        FROM rest p JOIN goldd g ON g.example = p.example AND
             ((g.s = p.s AND g.e = p.e AND g.tag <> p.tag) OR
              (g.s < g.e AND p.s < p.e AND g.s < p.e AND p.s < g.e))),
      first_match AS (SELECT * FROM matches WHERE rn = 1),
      classified AS (
        SELECT example, lt,
          CASE WHEN gs = ps AND ge = pe THEN 'IV'
               WHEN gtag = ptag THEN 'V' ELSE 'VI' END AS sc
        FROM first_match),
      spurious AS (SELECT p.example, p.lt FROM rest p WHERE NOT EXISTS (
          SELECT 1 FROM first_match f WHERE f.example = p.example
            AND f.ptag = p.tag AND f.ps = p.s AND f.pe = p.e)),
      overlapped AS (
        SELECT example, tag, s, e FROM exact
        UNION
        SELECT example, gtag, gs, ge FROM first_match),
      missed AS (SELECT g.example, g.lt FROM goldd g WHERE NOT EXISTS (
          SELECT 1 FROM overlapped ov WHERE ov.example = g.example
            AND ov.tag = g.tag AND ov.s = g.s AND ov.e = g.e)),
      counts AS (
        SELECT lt, 'I' AS sc FROM exact
        UNION ALL SELECT lt, sc FROM classified
        UNION ALL SELECT lt, 'SP' FROM spurious
        UNION ALL SELECT lt, 'MI' FROM missed),
      tallies AS (SELECT lt, sc, count(*) AS n FROM counts GROUP BY 1, 2),
      tallies2 AS (
        SELECT lt, sc, n FROM tallies
        UNION ALL
        SELECT 'overall', sc, CAST(sum(n) AS BIGINT) FROM tallies GROUP BY 2),
      schemas AS (SELECT unnest(['strict','exact','partial','ent_type']) AS eval_schema),
      grid AS (SELECT t.lt AS listing_type, sh.eval_schema, t.sc, t.n
               FROM tallies2 t CROSS JOIN schemas sh),
      ctr AS (
        SELECT listing_type, eval_schema,
          CAST(sum(CASE WHEN sc = 'I'
                OR (sc = 'IV' AND eval_schema IN ('exact', 'partial'))
                OR (sc = 'V' AND eval_schema = 'ent_type')
                THEN n ELSE 0 END) AS BIGINT) AS correct,
          CAST(sum(CASE WHEN (sc = 'IV' AND eval_schema IN ('strict', 'ent_type'))
                OR (sc = 'V' AND eval_schema IN ('strict', 'exact'))
                OR (sc = 'VI' AND eval_schema IN ('strict', 'exact', 'ent_type'))
                THEN n ELSE 0 END) AS BIGINT) AS incorrect,
          CAST(sum(CASE WHEN sc IN ('V', 'VI') AND eval_schema = 'partial'
                THEN n ELSE 0 END) AS BIGINT) AS partial,
          CAST(sum(CASE WHEN sc = 'MI' THEN n ELSE 0 END) AS BIGINT) AS missed,
          CAST(sum(CASE WHEN sc = 'SP' THEN n ELSE 0 END) AS BIGINT) AS spurious
        FROM grid GROUP BY 1, 2)
      SELECT listing_type, eval_schema, correct, incorrect, partial, missed,
        spurious,
        CAST(correct + incorrect + partial + missed AS BIGINT) AS possible,
        round(CASE WHEN correct + incorrect + partial + spurious > 0 THEN
          (CASE WHEN eval_schema IN ('partial', 'ent_type')
                THEN correct + 0.5 * partial
                ELSE CAST(correct AS DOUBLE) END)
          / (correct + incorrect + partial + spurious) ELSE 0 END, 6) AS precision,
        round(CASE WHEN correct + incorrect + partial + missed > 0 THEN
          (CASE WHEN eval_schema IN ('partial', 'ent_type')
                THEN correct + 0.5 * partial
                ELSE CAST(correct AS DOUBLE) END)
          / (correct + incorrect + partial + missed) ELSE 0 END, 6) AS recall
      FROM ctr"""
}
