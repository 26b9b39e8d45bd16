package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query isolation bench (guide §1.4): times individual declared queries
  * with the SAME action the frozen `graft.Bench` uses (`count()`), or the
  * noop sink (full-column evaluation) when `SPARK_GRAFT_BENCHX_ACTION=noop`.
  * Runs each query `SPARK_GRAFT_BENCHX_REPS` times (default 3) after one
  * warm-up and prints per-rep and min seconds; optionally writes the
  * formatted physical plan per query to `SPARK_GRAFT_BENCHX_PLANDIR`.
  *
  * This main is ADDITIVE measurement tooling — `Bench.scala` stays frozen.
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCHX_REPS", "3").toInt
    val action = sys.env.getOrElse("SPARK_GRAFT_BENCHX_ACTION", "count")
    val planDir = sys.env.get("SPARK_GRAFT_BENCHX_PLANDIR")
    val planOnly = sys.env.get("SPARK_GRAFT_BENCHX_PLAN_ONLY").contains("1")
    val names =
      if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
        .filterNot(_ == "kg_delta_identity")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.Normalize.register(spark)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      planDir.foreach { dir =>
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(p.resolve(s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      if (!planOnly) {
        def once(): Double = {
          spark.sparkContext.setJobDescription(s"benchx:$name")
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          if (action == "noop")
            df.write.format("noop").mode("overwrite").save()
          else df.count()
          (System.nanoTime() - t0) / 1e9
        }
        val cold = once() // first run: includes planning + codegen
        val times = (1 to reps).map(_ => once())
        println(f"BENCHX $name%-28s min=${times.min}%8.3f cold=$cold%8.3f " +
          times.map(t => f"$t%.3f").mkString("[", ", ", "]"))
      }
    }
    spark.stop()
  }
}
