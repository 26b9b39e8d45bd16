package graft

import graft.mine.{Cat2Ax, CategorySets}

/** Category-set construction goldens (category_set.py:45-72 semantics) and
  * the end-to-end chain into Cat2Ax axiom mining. */
class CategorySetsSpec extends SparkSuite {
  import spark.implicits._

  test("findChildSets groups siblings by shared back pattern") {
    val docs = Seq("c1990" -> "1990 albums", "c1991" -> "1991 albums",
                   "c1992" -> "1992 albums", "crock" -> "Rock albums",
                   "cjazz" -> "Jazz compilations")
      .map { case (c, l) => (c, l.split(" ")) }
    val got = CategorySets.findChildSets(docs)
    assert(got.size == 1)
    assert(got.head.front.isEmpty && got.head.back == Seq("albums"))
    assert(got.head.members == Set("c1990", "c1991", "c1992", "crock"))
  }

  test("findChildSets recurses: front pattern then remainder") {
    // 4 'Works of X' + 2 'Letters of X' under one parent: the front word
    // splits 4/6 (score .66) -> recurse into both halves
    val docs = Seq(
      "w1" -> "Works of Goethe", "w2" -> "Works of Schiller",
      "w3" -> "Works of Kleist", "w4" -> "Works of Heine",
      "l1" -> "Letters of Goethe", "l2" -> "Letters of Schiller")
      .map { case (c, l) => (c, l.split(" ")) }
    val got = CategorySets.findChildSets(docs)
    val byMembers = got.map(cs => (cs.front, cs.back, cs.members)).toSet
    assert(byMembers.exists { case (f, _, m) =>
      f.headOption.contains("Works") && m == Set("w1", "w2", "w3", "w4") })
    assert(byMembers.exists { case (f, _, m) =>
      f.headOption.contains("Letters") && m == Set("l1", "l2") })
  }

  test("by-phrases are stripped before pattern search (category_set.py:38)") {
    val pc = Seq(
      ("P", "c1", "Songs by genre"), // -> 'Songs'
      ("P", "c2", "Songs by year"),  // -> 'Songs'
      ("P", "c3", "Ballads"))
      .toDF("parent", "cat_id", "label")
    val got = CategorySets.categorySets(pc)
      .select("cat_id").as[String].collect().toSet
    assert(got == Set("c1", "c2")) // the two normalized 'Songs' group up
  }

  test("categorySets output is partitioning-invariant and feeds Cat2Ax") {
    val rows = Seq(
      ("Albums", "c1990", "1990 albums"), ("Albums", "c1991", "1991 albums"),
      ("Albums", "c1992", "1992 albums"), ("Albums", "crock", "Rock albums"),
      ("Albums", "cjazz", "Jazz compilations"),
      ("People", "sci", "Scientists of Europe"),
      ("People", "art", "Artists of Europe"),
      ("People", "mus", "Musicians of Europe"))
    val a = CategorySets.categorySets(rows.toDF("parent", "cat_id", "label"))
      .collect().map(_.toSeq).toSet
    val b = CategorySets.categorySets(
      rows.reverse.toDF("parent", "cat_id", "label").repartition(7))
      .collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)

    // end-to-end: constructed sets + member value frequencies -> axioms
    val catSets = CategorySets.categorySets(
      rows.toDF("parent", "cat_id", "label")).select("set_id", "cat_id")
    val freqs = Seq(
      ("c1990", "Album", 1.0), ("c1991", "Album", 0.9),
      ("c1992", "Album", 0.8), ("crock", "Album", 0.7),
      ("sci", "Person", 1.0), ("art", "Person", 0.9), ("mus", "Song", 0.6))
      .toDF("cat_id", "value", "freq")
    val axioms = Cat2Ax.mineAxioms(catSets, freqs, minMedian = 0.5)
      .select("value").as[String].collect().toSet
    // albums set: median(1,.9,.8,.7) = .85 -> Album axiom;
    // people set: Person freqs (1,.9) zero-padded to 3 -> median .9 -> Person
    assert(axioms == Set("Album", "Person"))
  }
}
