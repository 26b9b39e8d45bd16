package graft.mine

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import graft.core.Normalize

/** Category-set construction — groups of sibling categories sharing a
  * lexical front/back pattern (reference:
  * `/root/reference/impl/category/category_set.py:27-86`; consumed by the
  * Cat2Ax trie matching, `cat2ax.py:228-243,309-324`). This is the stage
  * that BUILDS the `catSets` input [[Cat2Ax.setMedians]] consumes, closing
  * the Cat2Ax path end-to-end.
  *
  * Algorithm (ported): per parent, tokenize the children's by-phrase-free
  * labels; recursively pick the most frequent word at the next front index
  * or the next back index (the larger group wins, front on ties); recurse
  * on the grouped docs with the extended pattern and on the ungrouped docs
  * with the unchanged pattern; emit the current doc set when the best
  * group is <2 members or <50% of the docs and a pattern exists.
  *
  * Spark shape: the recursion is PER PARENT and bounded by the parent's
  * child count, so it runs inside `flatMapGroups` keyed by parent — one
  * shuffle, each group independent (the same page-local argument as the
  * listing parser; the reference iterates parents in a driver loop).
  * Determinism: the reference's Counter.most_common(1) tie-break is
  * insertion-order-dependent; ours is (count desc, word asc) — pinned.
  */
object CategorySets {

  case class CatSet(front: Seq[String], back: Seq[String],
                    members: Set[String])

  private def bestGroup(docs: Seq[(String, Array[String])],
                        idx: Int): (Set[String], String) = {
    val eligible = docs.filter { case (_, d) => d.length > idx && d.length >= -idx }
    val at = eligible.map { case (c, d) =>
      (c, if (idx >= 0) d(idx) else d(d.length + idx))
    }
    if (at.isEmpty) return (Set.empty, "")
    // deterministic argmax: count desc, word asc
    val (bestWord, bestGrp) = at.groupBy(_._2).view
      .mapValues(_.map(_._1).toSet).toSeq
      .sortBy { case (w, g) => (-g.size, w) }.head
    (bestGrp, bestWord)
  }

  /** The reference's `_find_child_sets` (category_set.py:45-72). */
  def findChildSets(docs: Seq[(String, Array[String])],
                    pattern: (Seq[String], Seq[String]) = (Nil, Nil))
      : Seq[CatSet] = {
    if (docs.size < 2) return Nil
    val (frontGrp, frontWord) = bestGroup(docs, pattern._1.length)
    val (backGrp, backWord) = bestGroup(docs, -pattern._2.length - 1)
    val (grp, newPattern) =
      if (frontGrp.size >= backGrp.size)
        (frontGrp, (pattern._1 :+ frontWord, pattern._2))
      else
        (backGrp, (pattern._1, backWord +: pattern._2))
    val score = grp.size.toDouble / docs.size
    if (grp.size < 2 || score < 0.5) {
      if (pattern._1.nonEmpty || pattern._2.nonEmpty)
        Seq(CatSet(pattern._1, pattern._2, docs.map(_._1).toSet))
      else Nil
    } else {
      val (grouped, ungrouped) = docs.partition(d => grp(d._1))
      findChildSets(grouped, newPattern) ++ findChildSets(ungrouped, pattern)
    }
  }

  /** parentChild(parent, cat_id, label) → (set_id, parent, front_pattern,
    * back_pattern, cat_id), one row per member. set_id is content-derived
    * (parent + pattern), so it is partitioning-invariant — ready to feed
    * [[Cat2Ax.setMedians]]. Labels are by-phrase-stripped and
    * whitespace-tokenized (≙ category_set.py:38). */
  def categorySets(parentChild: DataFrame): DataFrame = {
    val spark = parentChild.sparkSession
    import spark.implicits._
    parentChild.select("parent", "cat_id", "label")
      .as[(String, String, String)]
      .groupByKey(_._1)
      .flatMapGroups { (parent, rows) =>
        val docs = rows.map { case (_, c, l) =>
          (c, Normalize.removeByPhraseJava(l)
            .split("\\s+").filter(_.nonEmpty))
        }.toSeq.sortBy(_._1) // stable input order for determinism
        findChildSets(docs).iterator.flatMap { cs =>
          val setId = parent + "|" + cs.front.mkString(" ") + "|" +
            cs.back.mkString(" ")
          cs.members.toSeq.sorted.map(m =>
            (setId, parent, cs.front.mkString(" "), cs.back.mkString(" "), m))
        }
      }(Encoders.product[(String, String, String, String, String)])
      .toDF("set_id", "parent", "front_pattern", "back_pattern", "cat_id")
  }
}
