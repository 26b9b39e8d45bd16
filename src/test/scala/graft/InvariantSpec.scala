package graft

import org.apache.spark.sql.functions._
import graft.ingest.TextExtract
import graft.testkit.CorpusGen

/** North-rule per-row invariant: extracted text is byte-identical per url —
  * vs the golden text column, across two runs, and across parallelism
  * levels (≙ the reference's fixed-seed reproducibility,
  * `evaluate_mention_detection.py:32-36`). */
class InvariantSpec extends SparkSuite {
  import spark.implicits._

  private lazy val pages = CorpusGen.default.pages.toDS().toDF()

  test("extracted text is byte-identical to the golden text column") {
    val extracted = TextExtract.extract(pages)
    val joined = extracted.alias("e")
      .join(pages.alias("p"), "url")
      .select(col("e.text").as("got"), col("p.text").as("want"))
    val mismatches = joined.filter(col("got") =!= col("want")).count()
    assert(mismatches == 0)
    // en pages only survive the language filter
    assert(extracted.count() == pages.filter(col("lang") === "en").count())
  }

  test("extraction is invariant across runs and partitionings") {
    def hashAll(parts: Int): Array[(String, String)] =
      TextExtract.extract(pages.repartition(parts))
        .select(col("url"), sha2(col("text"), 256).as("h"))
        .as[(String, String)].collect().sorted
    val a = hashAll(1)
    val b = hashAll(7)
    val c = hashAll(7) // second run, same partitioning
    assert(a.sameElements(b) && b.sameElements(c))
  }
}
