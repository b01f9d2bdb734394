package graft.diff
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object FdProbe {
  def fds: Int = new java.io.File("/proc/self/fd").list().length
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"FDS before=$fds")
    val root = java.nio.file.Files.createTempDirectory("fdprobe").toString
    val df = spark.range(n).select(col("id").as("pk"), (col("id") % 97).as("v"))
    val t0 = System.nanoTime()
    val t = graft.lake.LakeTable.create(spark, s"$root/t", "fx", df.schema,
      partitionSpec = Seq(graft.lake.PartitionField(
        "pk", graft.lake.Transform.Identity, "p_pk")))
    t.append(df)
    println(f"FDS after build=$fds build_sec=${(System.nanoTime()-t0)/1e9}%.1f")
    val t1 = System.nanoTime()
    t.append(spark.range(1).select(lit(10_000_000L).as("pk"), lit(0L).as("v")))
    println(f"FDS after commit=$fds commit_sec=${(System.nanoTime()-t1)/1e9}%.1f")
    val t2 = System.nanoTime()
    val c = t.scan().filter(col("pk") === 123L).count()
    println(f"FDS after scan=$fds rows=$c scan_sec=${(System.nanoTime()-t2)/1e9}%.1f")
    spark.stop()
  }
}
