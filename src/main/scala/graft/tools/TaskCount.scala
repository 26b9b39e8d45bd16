package graft.tools
import org.apache.spark.sql.SparkSession
object TaskCount {
  def main(args: Array[String]): Unit = {
    val Array(cpus, path) = args
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val df = s.read.parquet(path)
    println(s"SCANPARTS cpus=$cpus parts=${df.rdd.getNumPartitions} " +
      s"files=${new java.io.File(path).listFiles().count(_.getName.endsWith(".parquet"))}")
    s.stop()
  }
}
