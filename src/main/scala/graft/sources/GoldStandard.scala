package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Gold-standard corpus readers (S5; reference: tab-separated
  * mention-detection gold at
  * `/root/reference/impl/subject_entity/mention_detection/evaluation/dataset.py:66-77`
  * and JSON-lines corpora at `impl/util/spacy/listing_parser.py:22-33` /
  * `entity_disambiguation/data/nilk.py:80-114`). Schema per FIXTURES.md §5. */
object GoldStandard {

  val mdGoldSchema: StructType = StructType(Seq(
    StructField("label", StringType), StructField("page_url", StringType),
    StructField("link", StringType), StructField("topsection", StringType),
    StructField("section", StringType), StructField("listing_id", IntegerType),
    StructField("listing_type", StringType), StructField("example", StringType)))

  /** Tab-separated mention-detection gold (with header). */
  def readMentionGold(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .schema(mdGoldSchema).csv(path)

  /** JSON-lines corpus (schema inferred; one object per line). */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
