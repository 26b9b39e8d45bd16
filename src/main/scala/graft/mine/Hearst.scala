package graft.mine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Hearst-pattern hypernym extraction + multi-source hypernym merge
  * (N9/A5/A6; reference: matcher patterns
  * `/root/reference/impl/util/spacy/hearst_matcher.py:6-56`, corpus counts
  * `/root/reference/impl/wikipedia/nif_parser.py:34-45`, merge with
  * per-source thresholds and 2-of-3 vote
  * `/root/reference/impl/util/hypernymy.py:55-98`).
  *
  * The matcher is a page-local pure function (flatMap — zero shuffle, same
  * scaling argument as the listing parser); counting is one groupBy with
  * map-side combine (classic word-count shape).
  */
object Hearst {

  case class Hypernym(sub: String, obj: String)

  // (pattern, subGroup, objGroup, anchor) — lowercase token-level regexes
  // over one sentence. The lazy quantifier keeps an NP from swallowing the
  // tokens after it ("cities such as berlin grew" → object "berlin", not
  // "berlin grew"). `anchor` is a literal substring every match must
  // contain — an O(n) contains prescreen that skips the backtracking NP
  // regex on the vast majority of sentences.
  private val np = "([a-z][a-z0-9]*(?: [a-z][a-z0-9]*){0,2}?)"
  /** The reference's EXACT pattern inventory (`hearst_matcher.py:6-35`):
    * is-a (a/an), and-other, or-other, including, such-as, especially,
    * particularly, other-than — with the reference's reverse flags
    * (sub/obj group order). The classic "such NP as NP" is NOT in the
    * reference and is deliberately absent here. Leading NPs expand as far
    * as the anchor forces them (lazy quantifier); a TRAILING NP captures
    * only its first token — the regex stand-in for the reference's
    * noun-chunk expansion of the token after the anchor, which a regex
    * cannot see (documented approximation; the "1-3 word" bound applies to
    * leading NPs only). */
  private val patterns: Seq[(java.util.regex.Pattern, Int, Int, String)] = Seq(
    (s"$np is (?:a|an) $np".r.pattern, 1, 2, " is a"),
    (s"$np such as $np".r.pattern, 2, 1, " such as "),
    (s"$np and other $np".r.pattern, 1, 2, " and other "),
    (s"$np or other $np".r.pattern, 1, 2, " or other "),
    (s"$np including $np".r.pattern, 2, 1, " including "),
    (s"$np especially $np".r.pattern, 2, 1, " especially "),
    (s"$np particularly $np".r.pattern, 2, 1, " particularly "),
    (s"$np other than $np".r.pattern, 2, 1, " other than "))

  /** Fused sentence cleanup (≙ the former regex chain
    * `NonToken.replaceAll(" ")` → `Spaces("{2,}").replaceAll(" ")` →
    * `.trim`, whose NET semantics are: every run of non-[a-z0-9] chars —
    * including existing spaces — collapses to ONE space, with leading and
    * trailing runs removed). One char scan, one output string, instead of
    * two full regex passes + trim per sentence — this stage is the
    * pipeline's dominant wall (the soak lineage reads it at ~58% of the
    * full run), and the cost is string materialization, not matching.
    * Equivalence to the regex chain is property-tested (MineSpec). */
  private def cleanSentence(lower: String, from: Int, until: Int): String = {
    val sb = new java.lang.StringBuilder(until - from)
    var pendingSpace = false
    var i = from
    while (i < until) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length() > 0) sb.append(' ')
        sb.append(c)
        pendingSpace = false
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }

  /** Lowercase, split on [.!?], clean each sentence; empty cleaned
    * sentences are dropped (they match nothing in the regex-chain form, so
    * the drop is output-equivalent — split-artifact empties included).
    * Sentence split is a manual scan; lowercasing is the full-string
    * String.toLowerCase pinned to Locale.ROOT (a tr-locale executor must
    * not produce different tokens than the oracle machine).
    * Package-visible for the MineSpec equivalence property test. */
  private[graft] def cleanedSentences(text: String): Seq[String] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var i = 0
    while (i <= n) {
      val boundary = i == n || {
        val c = lower.charAt(i); c == '.' || c == '!' || c == '?'
      }
      if (boundary) {
        if (i > start) {
          val s = cleanSentence(lower, start, i)
          if (s.length > 0) out += s
        }
        start = i + 1
      }
      i += 1
    }
    out.toSeq
  }

  /** One sentence-split/cleanup/anchor-prescreen/matcher walk shared by
    * both extraction shapes — the patterns, anchors, and cleanup stay in
    * lock-step by construction. `extract` turns each regex match into zero
    * or one result. */
  private def matchWith[T](text: String)(
      extract: (java.util.regex.Matcher, Int, Int) => Option[T]): Seq[T] =
    cleanedSentences(text).flatMap { s =>
      patterns.flatMap { case (p, si, oi, anchor) =>
        if (!s.contains(anchor)) Nil
        else {
          val m = p.matcher(s)
          val out = scala.collection.mutable.ArrayBuffer.empty[T]
          while (m.find()) extract(m, si, oi).foreach(out += _)
          out
        }
      }
    }

  /** All hypernym pairs matched in one text (sentence-split on [.!?]). */
  def matchText(text: String): Seq[Hypernym] =
    matchWith(text) { (m, si, oi) =>
      // head-word approximation: last token of each noun phrase
      val sub = m.group(si).split(' ').last
      val obj = m.group(oi).split(' ').last
      if (sub != obj) Some(Hypernym(sub, obj)) else None
    }

  /** Full-span variant of [[matchText]]: (hyponym span, hypernym span)
    * pairs with the complete noun-phrase text of each side — what the
    * reference's type-lexicalisation loop consumes (`nif_parser.py:53-63`
    * keeps `sub.text` for the surface-form gate and iterates every word of
    * the hypernym span). No head truncation, no sub≠obj filter (the
    * reference applies neither before the gate). */
  def matchSpans(text: String): Seq[(String, String)] =
    matchWith(text)((m, si, oi) => Some((m.group(si), m.group(oi))))

  /** NIF-driven type lexicalisations (S4's real downstream — reference
    * `impl/wikipedia/nif_parser.py:49-63`): per page (resource, text),
    * Hearst span pairs; a pair survives only if its hyponym span is a
    * surface form referring to the page's own entity; then every word of
    * the hypernym span is singularized (N6 ≙ the reference's lemmatizer),
    * stop-words dropped, and counted against each of the entity's types.
    *
    * Shape at 100 TB: the span match is the same zero-shuffle flatMap as
    * [[corpusCounts]]; the surface-form gate and the type join broadcast
    * the alias dictionary and the entity-type table (the same small sides
    * J1 broadcasts); the only corpus-sized shuffle is the final word-count
    * groupBy with map-side combine.
    *
    * @param contexts     (resource, text) — e.g. [[graft.sources.NifSource.readContexts]]
    * @param surfaceForms (surface_form, ent)
    * @param entityTypes  (ent, tpe)
    */
  def typeLexCorpusCounts(contexts: Dataset[(String, String)],
                          surfaceForms: DataFrame,
                          entityTypes: DataFrame): DataFrame = {
    import contexts.sparkSession.implicits._
    val pairs = contexts
      .flatMap { case (res, t) => matchSpans(t).map { case (s, o) => (res, s, o) } }
      .toDF("resource", "sub", "obj_span")
    pairs
      .join(broadcast(surfaceForms),
        pairs("sub") === surfaceForms("surface_form") &&
          pairs("resource") === surfaceForms("ent"), "left_semi")
      .join(broadcast(entityTypes), col("resource") === entityTypes("ent"))
      .select(explode(split(col("obj_span"), " ")).as("word"), col("tpe"))
      .select(graft.core.Normalize.singularize(col("word")).as("word"), col("tpe"))
      .filter(!col("word").isin(TypeLexStopwords: _*))
      .groupBy("word", "tpe").agg(count(lit(1)).as("cnt"))
  }

  /** Deterministic stand-in for spaCy's STOP_WORDS (`nif_parser.py:44`) —
    * the closed-class tokens the synthetic fixtures can produce. */
  val TypeLexStopwords: Seq[String] =
    Seq("", "a", "an", "the", "of", "and", "or", "is", "are", "as", "such",
        "other", "including", "especially")

  /** (id, text) → hypernym pair counts over the corpus (A5). */
  def corpusCounts(texts: Dataset[(String, String)]): DataFrame = {
    import texts.sparkSession.implicits._
    texts.flatMap { case (_, t) => matchText(t) }
      .groupBy("sub", "obj").agg(count(lit(1)).as("cnt"))
  }

  /** (url, text) → per-url hypernym pair counts (url, sub, obj, cnt) — the
    * url-keyed form [[graft.Pipeline.runDelta]] checkpoints so the
    * minus-side of hypernym maintenance is a url-keyed row drop instead of
    * a re-parse of dropped prose (the global [[corpusCounts]] aggregate is
    * its groupBy(sub, obj) sum). */
  def corpusCountsByUrl(texts: Dataset[(String, String)]): DataFrame = {
    import texts.sparkSession.implicits._
    texts.flatMap { case (url, t) => matchText(t).map(h => (url, h.sub, h.obj)) }
      .toDF("url", "sub", "obj")
      .groupBy("url", "sub", "obj").agg(count(lit(1)).as("cnt"))
  }

  /** A4: type lexicalisation scores — per surface word, the normalized
    * distribution over hypernym types it evidences, with a minimum floor
    * for exact-label matches (≙ `/root/reference/impl/category/cat2ax.py:164-182`).
    * Input: hypernym counts (sub, obj, cnt); `exactLabels(word, tpe)` gets
    * the floor via `greatest`. */
  def typeLexicalisations(counts: DataFrame, exactLabels: DataFrame,
                          floor: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("sub")
    val scored = counts
      .withColumn("score", col("cnt") / sum("cnt").over(w))
      .select(col("sub").as("word"), col("obj").as("tpe"), col("score"))
    scored.join(exactLabels.withColumn("is_exact", lit(true)),
                Seq("word", "tpe"), "full_outer")
      .na.fill(0.0, Seq("score"))
      .withColumn("score",
        when(col("is_exact"), greatest(col("score"), lit(floor)))
          .otherwise(col("score")))
      .select(col("word"), col("tpe"), round(col("score"), 6).as("score"))
  }

  /** A6 merge: 3 sources with per-source min-count thresholds; a pair
    * survives with >= 2 votes. Inputs: (sub, obj, cnt) each. */
  def mergeSources(wiki: DataFrame, wikiThr: Long,
                   web: DataFrame, webThr: Long,
                   ratios: DataFrame, ratioThr: Double): DataFrame = {
    val v1 = wiki.filter(col("cnt") >= wikiThr)
      .select(col("sub"), col("obj"), lit(1).as("vote"))
    val v2 = web.filter(col("cnt") >= webThr)
      .select(col("sub"), col("obj"), lit(1).as("vote"))
    val v3 = ratios.filter(col("ratio") >= ratioThr)
      .select(col("sub"), col("obj"), lit(1).as("vote"))
    v1.unionByName(v2).unionByName(v3)
      .groupBy("sub", "obj").agg(sum("vote").as("votes"))
      .filter(col("votes") >= 2)
      .select("sub", "obj", "votes")
  }
}
