package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic sampling passes of a training-data pipeline: weighted
  * corpus mixing, train/val/test splitting, and per-domain capping.
  *
  * All three decide per-row from a PORTABLE content hash (md5 — identical
  * in Spark and DuckDB, unlike xxhash64), so runs are reproducible across
  * engines and re-runs, need no RNG state, and survive repartitioning —
  * the same partition-invariance discipline as the rest of the engine.
  * Mixing and splitting are row-local (zero shuffle, whole-stage codegen);
  * capping is ONE shuffle keyed by the cap key and plans as a
  * WindowGroupLimit (rank pushdown), so a hot domain never materializes
  * more than k rows per partition past the limit.
  */
object Sampling {

  /** Uniform bucket in [0, 65536): the first 4 hex chars of
    * md5(key ++ salt). Portable: DuckDB spells it
    * `('0x'||substr(md5(key||salt),1,4))::BIGINT`. */
  def bucket16(key: Column, salt: String): Column =
    graft.core.PortableHash.md5PrefixLong(
      concat(key.cast("string"), lit(salt)), 4)

  /** Weighted source mixing (the data-mixing pass before training: keep
    * each document with its source's sampling weight in [0,1]).
    * `weights`: (source, weight) — a handful of rows, always broadcast.
    * Upsampling (weight > 1) is out of scope here — that is a generator,
    * not a filter. */
  def mixBySource(docs: DataFrame, weights: DataFrame,
                  idCol: String = "doc_id",
                  salt: String = "mix"): DataFrame =
    docs.join(broadcast(weights), "source")
      .filter(bucket16(col(idCol), salt) < col("weight") * 65536)
      .drop("weight")

  /** Deterministic train/val/test assignment by hash range. Uniform within
    * any stratum (the hash ignores every attribute), so per-source or
    * per-language proportions hold automatically at scale. */
  def assignSplit(docs: DataFrame, idCol: String = "doc_id",
                  trainFrac: Double = 0.9, valFrac: Double = 0.05,
                  salt: String = "split"): DataFrame = {
    val b = bucket16(col(idCol), salt)
    docs.withColumn("split",
      when(b < trainFrac * 65536, "train")
        .when(b < (trainFrac + valFrac) * 65536, "val")
        .otherwise("test"))
  }

  /** Per-key document cap (C4-style domain balancing: at most k docs per
    * domain/source). The kept subset is a deterministic uniform sample —
    * hash order, id tie-break — not "first k seen", so it is
    * partition-invariant. */
  def capPerKey(docs: DataFrame, keyCol: String, k: Int,
                idCol: String = "doc_id",
                salt: String = "cap"): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(bucket16(col(idCol), salt).asc, col(idCol).asc)
    docs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  // — driver-contract queries over the documents table —

  def mixQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // sources outside the mix table are excluded entirely (the join)
    val weights = Seq(("src0", 0.5), ("src1", 1.0), ("src2", 0.25),
                      ("src3", 0.04)).toDF("source", "weight")
    mixBySource(Tables.documents(s, d), weights)
      .select("doc_id", "source")
  }

  val mixSql: String =
    """WITH w(source, weight) AS (VALUES ('src0', 0.5), ('src1', 1.0),
                                         ('src2', 0.25), ('src3', 0.04))
       SELECT doc_id, d.source FROM documents d JOIN w USING (source)
       WHERE ('0x'||substr(md5(doc_id||'mix'),1,4))::BIGINT
             < w.weight * 65536"""

  def splitQuery(s: SparkSession, d: String): DataFrame =
    assignSplit(Tables.documents(s, d))
      .groupBy("split").agg(count(lit(1)).as("cnt"))

  val splitSql: String =
    """SELECT CASE
         WHEN ('0x'||substr(md5(doc_id||'split'),1,4))::BIGINT < 0.9*65536
           THEN 'train'
         WHEN ('0x'||substr(md5(doc_id||'split'),1,4))::BIGINT < 0.95*65536
           THEN 'val'
         ELSE 'test' END AS split, count(*) AS cnt
       FROM documents GROUP BY 1"""

  def capQuery(s: SparkSession, d: String): DataFrame =
    capPerKey(Tables.documents(s, d), "source", 10)
      .select("doc_id", "source")

  val capSql: String =
    """SELECT doc_id, source FROM (
         SELECT doc_id, source, row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x'||substr(md5(doc_id||'cap'),1,4))::BIGINT,
                    doc_id) AS rn
         FROM documents) WHERE rn <= 10"""
}
