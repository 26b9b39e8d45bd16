package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Micro-probe for the StageRunner per-stage fixed costs: times (a) the
  * 1-row lineage parquet append as a Spark job, (b) the post-write
  * `read.parquet(...).count()` rows_out job, (c) a plain driver-side file
  * append for comparison. args = cpus reps. */
object LineageProbe {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.nonEmpty) args(0).toInt else 32
    val reps = if (args.length > 1) args(1).toInt else 20
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lineage-probe").toString

    // a representative small stage table to count (like a pipeline stage)
    spark.range(200000).selectExpr("id", "concat('u', id) as url")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/stage")

    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      (1 to reps).foreach(_ => f)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE $label%-28s total=${sec}%7.3f per=${sec / reps}%7.4f")
    }

    time("append-1row-parquet-job") {
      Seq(("s", "r", -1L, 0L, 0L, 1L, false, -1L, true))
        .toDF("stage", "run_id", "rows_in", "rows_out", "skipped", "wall_ms",
              "resumed", "loop_rounds", "converged")
        .write.mode(SaveMode.Append).parquet(s"$dir/_lineage")
    }
    time("read-count-stage") {
      spark.read.parquet(s"$dir/stage").count()
    }
    time("footer-rowcount-driver") {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(s"$dir/stage")
      val fs = p.getFileSystem(conf)
      val files = fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
      var n = 0L
      files.foreach { f =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromStatus(f, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try n += r.getRecordCount finally r.close()
      }
      assert(n == 200000L, s"footer count $n")
    }
    spark.stop()
  }
}
