package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind the 10⁶-file claims (r19): the SCALE curve measures
  * the files-heavy regime to 10⁵ entries; this builds a MILLION-entry
  * [[ManyFilesFixture]] (one snapshot, one manifest — the worst honest
  * layout: a real table's manifests split per commit) and times the
  * metadata paths the valve design reasons about at the next order of
  * magnitude: snapshot load (manifest parse), the ABOVE-valve
  * distributed manifest fold (default valve 200k < 10⁶), the raised-valve
  * DRIVER fold for comparison, and a one-file append commit against the
  * million live entries. The r18 verdict extrapolated "~15 minutes at
  * 10⁶ neglected files" for the pre-r19 decline-to-scan; this records
  * what the r19 fold actually costs there. Not a standing family: the
  * build itself is minutes of filesystem work, paid per invocation.
  *
  *   SPARK_DRIVER_MEM=12g sbt "Test/runMain graft.lake.MillionFileProbe [n]"
  */
object MillionFileProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 1000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val root = graft.TempDirs.scoped("graft-megafile")
    val dir = root.resolve("t").toString
    timed(s"build ($n hard-linked one-row files, one commit)") {
      ManyFilesFixture.build(spark, dir, "mega", n)
    }
    val t = timed("cold load + manifest parse") {
      val t2 = LakeTable.load(spark, dir)
      require(t2.currentSnapshot.dataFiles.size == n, "fixture short")
      t2
    }
    def rollup = spark.read.format("graftlake").option("path", dir).load()
      .agg(count(lit(1)).as("n_rows"), min(col("pk")).as("mn"), max(col("pk")).as("mx"))
    val folds0 = graft.plans.LakeMetaAggregate.distributedServes.get()
    val r1 = timed("ABOVE-valve distributed manifest fold (cold)")(rollup.collect()(0))
    require(graft.plans.LakeMetaAggregate.distributedServes.get() > folds0,
      "distributed path not taken")
    require(r1.getLong(0) == n && r1.getLong(1) == 0L && r1.getLong(2) == n - 1,
      s"wrong metadata answer: $r1")
    timed("ABOVE-valve distributed manifest fold (warm)")(rollup.collect())
    spark.conf.set("spark.graft.lake.metaAggMaxFiles", (n + 10).toString)
    val r2 = timed("raised-valve DRIVER fold (planner-resident)")(rollup.collect()(0))
    require(r2 == r1, s"driver fold disagrees: $r2 vs $r1")
    spark.conf.unset("spark.graft.lake.metaAggMaxFiles")
    timed(s"one-file append commit against $n live entries") {
      t.append(spark.range(1).select(lit(10_000_000L).as("pk"), lit(0L).as("v")))
    }
    spark.stop()
    println("[probe] done (fixture cleaned by the scoped-tempdir shutdown hook)")
  }
}
