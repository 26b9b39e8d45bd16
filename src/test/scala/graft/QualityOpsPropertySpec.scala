package graft

import graft.ops.{Dedup, TextOps}

/** Brute-force twins for the quality operators: on a randomized (seeded)
  * corpus, the DataFrame operators must agree exactly with a direct Scala
  * computation of the same definitions — including the round-half-up to 6
  * decimals both sides of the driver's DuckDB compare use. */
class QualityOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  // low-entropy vocabulary: dense shingle collisions exercise CommonDf and
  // the duplicated-n-gram fractions
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")

  private lazy val corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7)
    (0 until 60).map { i =>
      val n = 3 + rnd.nextInt(28)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
  }

  private lazy val dir: String = {
    val d = SparkSuite.tempDir("graft-quality-prop")
    corpus.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition == brute-force twin on a randomized corpus") {
    val got = TextOps.repetition(spark, dir)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1).toSeq
    val expected = corpus.map { case (id, text) =>
      val t = text.split(" ").toSeq
      def grams(k: Int) = t.sliding(k).map(_.mkString(" ")).toSeq
      def dupFrac(g: Seq[String]) =
        r6((g.size - g.distinct.size).toDouble / g.size)
      val top = t.groupBy(identity).values.map(_.size).max
      (id, r6(top.toDouble / t.size), dupFrac(grams(2)), dupFrac(grams(3)))
    }
    assert(got == expected)
  }

  test("commonNgrams == brute-force twin on a randomized corpus") {
    val got = Dedup.commonNgrams(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val sh: Map[Long, Seq[String]] = corpus.map { case (id, text) =>
      id -> text.split(" ").toSeq.sliding(3).map(_.mkString(" "))
        .toSeq.distinct
    }.toMap
    val df: Map[String, Int] = sh.values.flatten.toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = corpus.map { case (id, _) =>
      val mine = sh(id)
      val common = mine.count(df(_) >= Dedup.CommonDf)
      (id, mine.size.toLong, common.toLong,
       r6(common.toDouble / mine.size))
    }
    assert(got == expected)
  }
}
