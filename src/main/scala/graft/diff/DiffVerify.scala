package graft.diff

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Differential-family dump (VERDICT r11 #2): materializes `n` seeded
  * [[QueryGen]] instances in the exact [[graft.Verify]] output contract —
  * one canonical-ordered parquet dir per query plus `oracle_sql.json` —
  * so `tools/check_oracle.py` replays every generated instance against
  * DuckDB unchanged:
  *
  *   sbt "runMain graft.diff.DiffVerify /root/testdata/sf0.01 /tmp/diff_out 120"
  *   python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/diff_out
  *
  * An optional 4th arg sets the FIRST seed (default 1), so soak legs can
  * walk fresh never-exercised seed ranges without re-running the prior
  * ones: `… DiffVerify <sf> <out> 1000 2001` runs seeds 2001–3000.
  *
  * The in-repo spec (QueryGenSpec) cross-checks the same instances
  * DataFrame-vs-SparkSQL on every `sbt test`; this main adds the
  * cross-ENGINE leg of the family. */
object DiffVerify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val n = if (args.length > 2) args(2).toInt else 120
    val from = if (args.length > 3) args(3).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var failed = 0
    val sqls = (from until from + n).flatMap { seed =>
      val g = QueryGen.gen(seed.toLong)
      try {
        val df = g.build(spark, sfDir)
        val canonical = df.orderBy(
          df.columns.map(c => org.apache.spark.sql.functions.col(c).asc_nulls_first): _*)
        canonical.coalesce(1).write.mode("overwrite").parquet(s"$outDir/${g.name}")
        Some(g.name -> g.sql)
      } catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[diff] ${g.name} failed: ${e.getMessage}")
        // a failed instance has no parquet dump dir — keeping its key in
        // oracle_sql.json would make the check_oracle replay report a
        // spurious missing-dir FAIL on top of this run's nonzero exit
        // (ADVICE r12); the exit code is the failure signal
        None
      }
    }
    println(s"[diff] ${n - failed}/$n generated queries dumped" +
      (if (failed > 0) s" ($failed FAILED)" else ""))
    val json = sqls.map { case (k, v) =>
      s"${graft.JsonStr.q(k)}: ${graft.JsonStr.q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    if (failed > 0) sys.exit(1)
  }
}
