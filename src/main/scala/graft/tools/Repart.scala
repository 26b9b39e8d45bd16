package graft.tools
import org.apache.spark.sql.SparkSession
/** One-off: rewrite a pages parquet dir at a given partition count. */
object Repart {
  def main(args: Array[String]): Unit = {
    val Array(in, out, n) = args
    val s = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.read.parquet(in).repartition(n.toInt)
      .write.mode("overwrite").parquet(out)
    s.stop()
  }
}
