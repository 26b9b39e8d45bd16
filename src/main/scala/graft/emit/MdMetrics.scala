package graft.emit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mention-detection span evaluation under the four matching schemas
  * (A17's MD side; reference: `SETagsEvaluator`,
  * `/root/reference/impl/subject_entity/mention_detection/evaluation/metrics.py:12-158`):
  * per example (chunk), predicted and gold tag spans are compared and each
  * prediction lands in one scenario —
  *
  *   I   exact span + type        → correct in all four schemas
  *   IV  exact span, wrong type   → strict/ent_type incorrect,
  *                                   exact/partial correct
  *   V   overlap, same type       → strict/exact incorrect, ent_type
  *                                   correct, partial "partial"
  *   VI  overlap, wrong type      → strict/ent_type/exact incorrect,
  *                                   partial "partial"
  *   II  no overlap               → spurious (all four)
  *   III gold never overlapped    → missed (all four)
  *
  * and P/R per schema: strict/exact use correct/actual; partial/ent_type
  * use (correct + 0.5·partial)/actual (metrics.py:120-139). Counters are
  * kept per listing type plus an 'overall' rollup (metrics.py:23-42).
  *
  * DETERMINISM NOTE: the reference iterates `true_named_entities` (a
  * Python set) and stops at the FIRST true entity that overlaps the
  * prediction, so a prediction overlapping several golds is classified by
  * unspecified set order. This port iterates golds in ascending
  * (start, end, type) order — a deterministic refinement; predictions
  * whose overlap set is a single gold (the common case, and every
  * exact-match) are unaffected.
  *
  * Distributed shape: span collection and scenario classification are
  * row-local per example (flatMap, zero shuffle); the only shuffles are
  * the example-keyed grouping of input spans (balanced — examples are
  * chunk-sized) and the final counter rollup with map-side combine, both
  * eval-corpus-sized, never the page corpus.
  */
object MdMetrics {

  case class Span(tag: String, start: Int, end: Int)

  val Schemas: Seq[String] = Seq("strict", "exact", "partial", "ent_type")

  /** Token-label walk ≙ `_collect_named_entities` (metrics.py:141-158):
    * id 0 closes an open entity; a nonzero id OPENS one only when none is
    * open (a different nonzero id mid-entity does NOT split — the entity
    * keeps its first id as type); a trailing entity closes at end. */
  def collectEntities(ids: Seq[Int]): Seq[Span] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Span]
    var start = -1
    var tpe = 0
    var off = 0
    for (id <- ids) {
      if (id == 0) {
        if (tpe != 0) { out += Span(tpe.toString, start, off); tpe = 0 }
      } else if (tpe == 0) { tpe = id; start = off }
      off += 1
    }
    if (tpe != 0) out += Span(tpe.toString, start, ids.length)
    out.toSeq
  }

  /** Apply the gold-side ignore mask to BOTH sequences (metrics.py:30-36:
    * `labels != IGNORE` boolean-indexes preds and labels, so offsets
    * COMPRESS over the kept positions), then walk each to spans. */
  def maskedPair(predIds: Seq[Int], goldIds: Seq[Int],
                 ignore: Int = -100): (Seq[Span], Seq[Span]) = {
    val kept = predIds.zip(goldIds).filter(_._2 != ignore)
    (collectEntities(kept.map(_._1)), collectEntities(kept.map(_._2)))
  }

  /** One example's scenario counters:
    * schema → (correct, incorrect, partial, missed, spurious), in
    * [[Schemas]] order. Inputs are de-duplicated (the reference compares
    * SETS of entities). */
  def classify(predsIn: Seq[Span], truesIn: Seq[Span])
      : Seq[(String, (Long, Long, Long, Long, Long))] = {
    implicit val ord: Ordering[Span] =
      Ordering.by((s: Span) => (s.start, s.end, s.tag))
    val preds = predsIn.distinct.sorted
    val trues = truesIn.distinct.sorted
    val trueSet = trues.toSet
    val CO = 0; val IN = 1; val PA = 2; val MI = 3; val SP = 4
    val S = 0; val E = 1; val P = 2; val T = 3
    val c = Array.fill(4, 5)(0L)
    var overlapped = Set.empty[Span]
    for (p <- preds) {
      if (trueSet.contains(p)) { // scenario I
        overlapped += p
        c(S)(CO) += 1; c(E)(CO) += 1; c(P)(CO) += 1; c(T)(CO) += 1
      } else {
        // per gold (in sorted order — see determinism note): scenario IV's
        // exact-offsets-wrong-type test fires before the generic overlap
        // test, exactly like the reference's per-true if/elif. The overlap
        // test is the reference's range-SET intersection
        // (metrics.py:66-79): a zero-length span has an EMPTY range, so it
        // can never overlap — without the non-emptiness terms a degenerate
        // (tag, 3, 3) pred inside a gold would classify V instead of the
        // reference's spurious (IV's offset-equality test has no such
        // guard in the reference either, so none here)
        trues.find(t =>
          (t.start == p.start && t.end == p.end && t.tag != p.tag) ||
          (t.start < t.end && p.start < p.end &&
           t.start < p.end && p.start < t.end)) match {
          case Some(t) =>
            overlapped += t
            if (t.start == p.start && t.end == p.end && t.tag != p.tag) {
              c(S)(IN) += 1; c(T)(IN) += 1; c(P)(CO) += 1; c(E)(CO) += 1
            } else if (t.tag == p.tag) { // V
              c(S)(IN) += 1; c(T)(CO) += 1; c(P)(PA) += 1; c(E)(IN) += 1
            } else { // VI
              c(S)(IN) += 1; c(T)(IN) += 1; c(P)(PA) += 1; c(E)(IN) += 1
            }
          case None => // scenario II
            c(S)(SP) += 1; c(E)(SP) += 1; c(P)(SP) += 1; c(T)(SP) += 1
        }
      }
    }
    val missed = trues.count(t => !overlapped.contains(t)) // scenario III
    for (k <- 0 to 3) c(k)(MI) += missed
    Schemas.zip(Seq(S, E, P, T)).map { case (n, k) =>
      (n, (c(k)(0), c(k)(1), c(k)(2), c(k)(3), c(k)(4)))
    }
  }

  /** Token range of `phrase` (first occurrence) within `text` after
    * stripping listing markup and whitespace-tokenizing — the adapter that
    * turns label-level gold/pred rows (the S5 TSV keeps raw item text +
    * link text, not offsets) into the span coordinates the evaluator
    * compares. */
  def locateTokens(text: String, phrase: String): Option[(Int, Int)] = {
    val toks = text.replaceAll("[\\[\\]{}|*!]", " ")
      .split("\\s+").filter(_.nonEmpty).toSeq
    val p = phrase.split("\\s+").filter(_.nonEmpty).toSeq
    if (p.isEmpty) None
    else (0 to toks.size - p.size)
      .find(i => toks.slice(i, i + p.size) == p)
      .map(i => (i, i + p.size))
  }

  /** Span-table evaluation: `pred` and `gold` both carry
    * (example, listing_type, tag, start, end); returns the counter + P/R
    * table — one row per (listing_type ∪ 'overall') × schema. */
  def evaluate(pred: DataFrame, gold: DataFrame): DataFrame = {
    val s = pred.sparkSession
    import s.implicits._
    def packed(df: DataFrame, as: String) = df
      .select(col("example").cast("string").as("example"), col("listing_type"),
              struct(col("tag"), col("start").cast("int").as("start"),
                     col("end").cast("int").as("end")).as("sp"))
      .groupBy("example", "listing_type").agg(collect_list("sp").as(as))
    val perExample = packed(pred, "preds")
      .join(packed(gold, "golds"), Seq("example", "listing_type"), "full_outer")
      .select(col("listing_type"), col("preds"), col("golds"))
      .as[(String, Seq[(String, Int, Int)], Seq[(String, Int, Int)])]
      .flatMap { case (lt, ps, gs) =>
        val toSpans = (xs: Seq[(String, Int, Int)]) =>
          Option(xs).getOrElse(Nil).map(x => Span(x._1, x._2, x._3))
        classify(toSpans(ps), toSpans(gs)).map {
          case (sc, (co, in, pa, mi, sp)) => (lt, sc, co, in, pa, mi, sp)
        }
      }
      .toDF("listing_type", "eval_schema", "correct", "incorrect",
            "partial", "missed", "spurious")
    finish(perExample)
  }

  /** Chunk-level (token id) evaluation — the reference's EvalPrediction
    * shape: one row per chunk with (listing_type, pred_ids, gold_ids);
    * gold positions equal to `ignore` are masked from both sides. */
  def evaluateTokens(chunks: DataFrame, ignore: Int = -100): DataFrame = {
    val s = chunks.sparkSession
    import s.implicits._
    val perExample = chunks.select("listing_type", "pred_ids", "gold_ids")
      .as[(String, Seq[Int], Seq[Int])]
      .flatMap { case (lt, p, g) =>
        val (ps, gs) = maskedPair(p, g, ignore)
        classify(ps, gs).map {
          case (sc, (co, in, pa, mi, sp)) => (lt, sc, co, in, pa, mi, sp)
        }
      }
      .toDF("listing_type", "eval_schema", "correct", "incorrect",
            "partial", "missed", "spurious")
    finish(perExample)
  }

  /** Counter rollup (+ 'overall' across listing types) and the schema-
    * dependent P/R (metrics.py:120-139): possible = c+i+p+m (gold-side),
    * actual = c+i+p+s (system-side); partial/ent_type credit half for
    * partial overlaps. */
  private def finish(perExample: DataFrame): DataFrame = {
    val sums = Seq("correct", "incorrect", "partial", "missed", "spurious")
      .map(c => sum(col(c)).as(c))
    val perType = perExample.groupBy("listing_type", "eval_schema")
      .agg(sums.head, sums.tail: _*)
    val overall = perExample.groupBy("eval_schema")
      .agg(sums.head, sums.tail: _*)
      .withColumn("listing_type", lit("overall"))
      .select(perType.columns.map(col): _*)
    val all = perType.unionByName(overall)
    val possible = col("correct") + col("incorrect") + col("partial") + col("missed")
    val actual = col("correct") + col("incorrect") + col("partial") + col("spurious")
    val num = when(col("eval_schema").isin("partial", "ent_type"),
                   col("correct") + lit(0.5) * col("partial"))
      .otherwise(col("correct").cast("double"))
    all
      .withColumn("possible", possible)
      .withColumn("precision",
        round(when(actual > 0, num / actual).otherwise(0.0), 6))
      .withColumn("recall",
        round(when(possible > 0, num / possible).otherwise(0.0), 6))
  }
}
