package graft.mine

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.core.Normalize

/** Cat2Ax pattern PROBE (r2 VERDICT ask #3) — match NEW category labels
  * against the front/back/enclosing patterns discovered by
  * [[CategorySets]], so mined axioms apply beyond their originating sets
  * (reference: `/root/reference/impl/category/cat2ax.py:228-243`
  * `_detect_patterns` + the three-dict wiring at `:309-324,362-372`).
  *
  * Faithful trie semantics (hand-traced goldens in MineSpec):
  *  - three dicts probed independently: front-only, back-only, enclosing;
  *  - every fill ends `front-words → REVERSE-marker → reversed back-words
  *    → HIT` (a front-only pattern has an EMPTY reversed-back path, so its
  *    HIT sits immediately under the REVERSE marker — exactly the
  *    reference's `_fill_dict` with a callable leaf);
  *  - the walk is GREEDY with NO backtracking: descend while the next word
  *    is a child; at the first failing word, return the HIT at the current
  *    node, else recurse the REVERSE-marker trie over the REVERSED words,
  *    else no match — a longer trie path that diverges later hides a
  *    shorter pattern (the reference behaves identically);
  *  - consuming ALL words without failing = no match (the pattern must be
  *    a proper affix: something must remain as the text diff).
  *
  * Spark shape: the pattern set is taxonomy-scale → tries build on the
  * driver and ride the closure (broadcast by the task serializer); the
  * label side is ONE flatMap pass — zero shuffle, scales to any corpus of
  * new categories.
  */
object PatternProbe {

  final class Trie extends Serializable {
    val children = new scala.collection.mutable.HashMap[String, Trie]
    var reverse: Option[Trie] = None
    var hit: Option[(Seq[String], Seq[String])] = None // (front, back)
  }

  /** ≙ `_fill_dict(d, front, λd'. _fill_dict(d', reversed(back), leaf))`. */
  def fill(root: Trie, front: Seq[String], back: Seq[String]): Unit = {
    var ctx = root
    front.foreach(w => ctx = ctx.children.getOrElseUpdate(w, new Trie))
    val rev = ctx.reverse.getOrElse { val t = new Trie; ctx.reverse = Some(t); t }
    var ictx = rev
    back.reverse.foreach(w => ictx = ictx.children.getOrElseUpdate(w, new Trie))
    ictx.hit = Some((front, back))
  }

  def buildTrie(patterns: Seq[(Seq[String], Seq[String])]): Trie = {
    val root = new Trie
    patterns.foreach { case (f, b) => fill(root, f, b) }
    root
  }

  /** The greedy walk (≙ `_detect_patterns`): returns the matched pattern
    * and (front_len, back_len). */
  def detect(root: Trie, words: Seq[String]): Option[(Seq[String], Seq[String], Int, Int)] = {
    var ctx = root
    var plen = 0
    for (word <- words) {
      ctx.children.get(word) match {
        case Some(next) => ctx = next; plen += 1
        case None =>
          // failure point: HIT first, then the REVERSE recursion
          ctx.hit match {
            case Some((f, b)) => return Some((f, b, plen, 0))
            case None =>
              ctx.reverse match {
                case Some(rt) =>
                  return detectReversed(rt, words.reverse)
                    .map { case (f, b, blen) => (f, b, plen, blen) }
                case None => return None
              }
          }
      }
    }
    None // all words consumed — nothing left to be the text diff
  }

  private def detectReversed(root: Trie, rwords: Seq[String]): Option[(Seq[String], Seq[String], Int)] = {
    var ctx = root
    var blen = 0
    for (word <- rwords) {
      ctx.children.get(word) match {
        case Some(next) => ctx = next; blen += 1
        case None => return ctx.hit.map { case (f, b) => (f, b, blen) }
      }
    }
    None
  }

  /** patterns(front_pattern, back_pattern) — space-joined strings, as
    * [[CategorySets.categorySets]] emits — probed over
    * newCats(cat_id, label) (labels are by-phrase-stripped + whitespace-
    * tokenized like the set construction). Output: one row per (category,
    * matching dict): (cat_id, dict, front_pattern, back_pattern,
    * front_len, back_len, text_diff). */
  def probe(patterns: DataFrame, newCats: DataFrame): DataFrame = {
    val spark = patterns.sparkSession
    import spark.implicits._
    val pats = patterns.select("front_pattern", "back_pattern")
      .distinct().as[(String, String)].collect().toSeq
      .map { case (f, b) =>
        (f.split(" ").filter(_.nonEmpty).toSeq,
         b.split(" ").filter(_.nonEmpty).toSeq)
      }
    // the reference's three dicts (cat2ax.py:362-372)
    val dicts: Seq[(String, Trie)] = Seq(
      "front" -> buildTrie(pats.filter(p => p._1.nonEmpty && p._2.isEmpty)),
      "back" -> buildTrie(pats.filter(p => p._1.isEmpty && p._2.nonEmpty)),
      "enclosing" -> buildTrie(pats.filter(p => p._1.nonEmpty && p._2.nonEmpty)))
    newCats.select("cat_id", "label").as[(String, String)]
      .flatMap { case (catId, label) =>
        val words = Normalize.removeByPhraseJava(label)
          .split("\\s+").filter(_.nonEmpty).toSeq
        dicts.flatMap { case (dictName, trie) =>
          detect(trie, words).map { case (f, b, flen, blen) =>
            val diff = words.slice(flen, words.length - blen).mkString(" ")
            (catId, dictName, f.mkString(" "), b.mkString(" "),
             flen, blen, diff)
          }
        }
      }(Encoders.product[(String, String, String, String, Int, Int, String)])
      .toDF("cat_id", "dict", "front_pattern", "back_pattern",
            "front_len", "back_len", "text_diff")
  }

  /** End-to-end application: axioms mined per SET ([[Cat2Ax.mineAxioms]])
    * become pattern-keyed via the set table, then new categories pick up
    * the best axiom of their matched pattern (median desc, value asc —
    * the repo's standard tie-break). */
  def axiomsForNewCats(catSets: DataFrame, axioms: DataFrame,
                       newCats: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("front_pattern", "back_pattern")
      .orderBy(col("median_freq").desc, col("value").asc)
    val patternAxioms = catSets
      .select("set_id", "front_pattern", "back_pattern").distinct()
      .join(axioms, "set_id")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("front_pattern", "back_pattern", "value", "median_freq")
    probe(catSets, newCats)
      .join(patternAxioms, Seq("front_pattern", "back_pattern"))
      .select("cat_id", "dict", "front_pattern", "back_pattern",
              "text_diff", "value", "median_freq")
  }
}
