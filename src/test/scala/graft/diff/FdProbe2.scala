package graft.diff
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FdProbe2 {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("fdprobe2").toString
    val df = spark.range(n).select(col("id").as("pk"), (col("id") % 97).as("v"))
    val t0 = System.nanoTime()
    df.write.partitionBy("pk").parquet(s"$root/p")
    println(f"raw spark partitionBy write: ${(System.nanoTime()-t0)/1e9}%.1f s for $n files")
  }
}
