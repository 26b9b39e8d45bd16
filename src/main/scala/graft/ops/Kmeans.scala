package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Spherical k-means centroid training for the IVF operators — the
  * trainable replacement for the deterministic centroid FIXTURE the oracle
  * queries pin (reference ANN role: hnswlib index construction,
  * `/root/reference/impl/subject_entity/entity_disambiguation/matching/transformer_util.py:75-89`;
  * we train coarse quantizer cells instead of an HNSW graph because cell
  * blocking is the shape that scales on Spark).
  *
  * Algorithm: vectors are L2-normalized ONCE, so argmax-cosine ≡ argmax-dot;
  * each Lloyd round is
  *   assign:   broadcast centroid join + per-vector window argmax (one
  *             corpus-side pass, no shuffle of the corpus — the window key
  *             is vec_id, already unique, so Spark plans a local argmax);
  *   recenter: element-wise mean per cell via posexplode + (cell, pos)
  *             aggregation (two small shuffles keyed by cell — centroid-
  *             sized, not corpus-sized), then re-normalization;
  * with `localCheckpoint` per round truncating the iterative lineage
  * (the ConnectedComponents discipline). Empty cells keep their previous
  * centroid. The spherical objective Σ cos(x, c(x)) is non-decreasing per
  * round (Lloyd monotonicity — property-tested in KmeansSpec).
  *
  * Seeding: [[seedFarthestFirst]] is a DETERMINISTIC farthest-first
  * traversal (argmin-of-max-similarity, ties by vec_id) — reproducible
  * under any partitioning, which the k-means|| random-oversampling init is
  * not; at 10^12-doc scale both run on a small deterministic sample of the
  * corpus, where farthest-first's k passes are equally cheap.
  */
object Kmeans {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** L2-normalize an array<double> column (zero vectors pass through). */
  def l2normalize(c: Column): Column = {
    val n = sqrt(dot(c, c))
    when(n > 0, transform(c, x => x / n)).otherwise(c)
  }

  /** vectors(vec_id, emb) → k centroids(cent_id, ce), deterministic:
    * start from the min-id vector; repeatedly add the vector farthest
    * (min max-cosine) from the chosen set, ties broken by vec_id asc. */
  def seedFarthestFirst(vectors: DataFrame, k: Int): DataFrame = {
    val v = vectors.select(col("vec_id"), l2normalize(col("emb")).as("emb"))
      .localCheckpoint()
    var (chosen, chosenIds) = graft.runtime.Checkpoints.tracked(
      v.orderBy("vec_id").limit(1)
        .select(lit(0L).as("cent_id"), col("emb").as("ce")))
    var i = 1
    while (i < k) {
      val far = v.join(broadcast(chosen))
        .withColumn("sim", dot(col("emb"), col("ce")))
        .groupBy("vec_id").agg(max("sim").as("max_sim"),
                               first("emb").as("emb"))
        .orderBy(col("max_sim").asc, col("vec_id").asc).limit(1)
        .select(lit(i.toLong).as("cent_id"), col("emb").as("ce"))
      def fresh(df: DataFrame): DataFrame =
        df.select(df.columns.map(c => col(c).as(c)): _*)
      val (next, nextIds) = graft.runtime.Checkpoints.tracked(
        fresh(chosen).unionByName(fresh(far)))
      graft.runtime.Checkpoints.free(chosen, chosenIds)
      chosen = next; chosenIds = nextIds
      i += 1
    }
    chosen
  }

  /** Lloyd iterations; returns (trained centroids(cent_id, ce),
    * per-round objective Σ cos — non-decreasing). */
  def train(vectors: DataFrame, init: DataFrame,
            iters: Int = 5): (DataFrame, Seq[Double]) = {
    val v = vectors.select(col("vec_id"), l2normalize(col("emb")).as("emb"))
      .localCheckpoint()
    var (cents, centIds) = graft.runtime.Checkpoints.tracked(
      init.select(col("cent_id"), l2normalize(col("ce")).as("ce")))
    val objective = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until iters) {
      val w = Window.partitionBy("vec_id")
        .orderBy(col("sim").desc, col("cent_id").asc)
      // the assigned frame is CORPUS-sized — tracked so each round's copy
      // is freed before the next (Checkpoints doc: the 8 GiB soak lesson)
      val (assigned, assignedIds) = graft.runtime.Checkpoints.tracked(
        v.join(broadcast(cents))
          .withColumn("sim", dot(col("emb"), col("ce")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("vec_id"), col("emb"), col("cent_id").as("cell"),
                  col("sim")))
      objective += assigned.agg(sum("sim")).head().getDouble(0)
      // element-wise mean per cell; empty cells keep the old centroid
      val means = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg("x").as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cell").as("cent_id"),
                l2normalize(transform(col("pm"), e => e.getField("m")))
                  .as("new_ce"))
      val (nextCents, nextCentIds) = graft.runtime.Checkpoints.tracked(
        cents.join(means, Seq("cent_id"), "left_outer")
          .select(col("cent_id"),
                  coalesce(col("new_ce"), col("ce")).as("ce")))
      graft.runtime.Checkpoints.free(assigned, assignedIds)
      graft.runtime.Checkpoints.free(cents, centIds)
      cents = nextCents; centIds = nextCentIds
    }
    (cents, objective.toSeq)
  }
}
