package graft.runtime

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Checkpoint-or-skip stage execution with lineage + counters — the Spark
  * re-expression of the reference's versioned cache memoization
  * (`/root/reference/utils.py:66-118`, registry `config.yaml:140-316`) and
  * the north rule's "resumable from checkpoint with per-partition lineage +
  * metrics".
  *
  * Each stage writes to `<outDir>/<stage>` (parquet; partitioned stages use
  * partitionBy so a re-run overwrites idempotently). A stage whose output
  * already exists (parquet _SUCCESS marker) is SKIPPED and read back —
  * resume = re-running the driver after a crash re-executes only missing
  * stages. Every run/skip appends a row to `<outDir>/_lineage`; partitioned
  * stages additionally append one row per output partition (per-partition
  * lineage).
  */
final class StageRunner(spark: SparkSession, outDir: String, runId: String) {

  private def path(stage: String) = s"$outDir/$stage"
  private def done(stage: String): Boolean =
    StageRunner.completed(outDir, stage)

  private def appendLineage(
      rows: Seq[(String, String, Long, Long, Long, Long, Boolean, Long, Boolean)]): Unit = {
    import spark.implicits._
    rows.toDF("stage", "run_id", "rows_in", "rows_out", "skipped", "wall_ms",
              "resumed", "loop_rounds", "converged")
      .write.mode(SaveMode.Append).parquet(s"$outDir/_lineage")
  }

  /** Run (or resume) an unpartitioned stage. `rowsIn` is a cheap driver-side
    * count supplied by the caller when known (-1 = unknown; never forces an
    * extra job on the hot path). `report`: a [[LoopReport]] the stage body's
    * iterative operator fills — its rounds/converged land in the lineage row
    * (loop_rounds = -1 ⇔ no iterative op ran). */
  def run(stage: String, rowsIn: Long = -1L, report: LoopReport = null)
         (f: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    def loopCols: (Long, Boolean) =
      if (report == null) (-1L, true) else (report.rounds, report.converged)
    if (done(stage)) {
      val df = spark.read.parquet(path(stage))
      appendLineage(Seq((stage, runId, rowsIn, df.count(), 0L,
        (System.nanoTime() - t0) / 1000000, true, -1L, true)))
      df
    } else {
      f.write.mode(SaveMode.Overwrite).parquet(path(stage))
      val df = spark.read.parquet(path(stage))
      val (rounds, conv) = loopCols
      appendLineage(Seq((stage, runId, rowsIn, df.count(), 0L,
        (System.nanoTime() - t0) / 1000000, false, rounds, conv)))
      df
    }
  }

  /** Run (or resume) a stage partitioned by `partCol` (the triple tables'
    * partitionBy(pred)); appends per-partition lineage rows.
    *
    * Writes use DYNAMIC partition overwrite: a re-run (or a backfill whose
    * DataFrame covers only a subset of partitions) replaces exactly the
    * partitions present in the data and leaves the rest untouched — the
    * parquet equivalent of Iceberg's idempotent partition-overwrite commit
    * (north rule: per-partition checkpoint; swap the format string for
    * "iceberg" when the runtime ships the jars). */
  def runPartitioned(stage: String, partCol: String, rowsIn: Long = -1L)
                    (f: => DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val resumed = done(stage)
    if (!resumed)
      f.write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partCol)
        .parquet(path(stage))
    val df = spark.read.parquet(path(stage))
    val wall = (System.nanoTime() - t0) / 1000000
    val perPart = df.groupBy(partCol).count().collect().toSeq
      .map(r => (s"$stage/$partCol=${r.get(0)}", runId, rowsIn, r.getLong(1),
                 0L, wall, resumed, -1L, true))
    appendLineage(perPart :+
      ((stage, runId, rowsIn, perPart.map(_._4).sum, 0L, wall, resumed,
        -1L, true)))
    df
  }

  def lineage(): DataFrame = spark.read.parquet(s"$outDir/_lineage")
}

object StageRunner {
  /** A stage checkpoint is complete iff its parquet _SUCCESS marker exists
    * — the single definition of "done" (resume-or-skip here, the prevDir
    * contract probe in [[graft.Pipeline.runDelta]]); an object-store-aware
    * completeness check replaces exactly this one method. */
  def completed(dir: String, stage: String): Boolean =
    Files.exists(Paths.get(s"$dir/$stage", "_SUCCESS"))
}
