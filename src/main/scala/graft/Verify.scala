package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
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
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Local-iteration filter (same contract as SPARK_GRAFT_BENCH_ONLY);
    // unset = the full registry, which is what the driver runs.
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // a typo'd name must fail loudly, not select zero queries and "pass"
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty,
        s"SPARK_GRAFT_VERIFY_ONLY names not in the registry: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    val selected = SparkEntry.queries.filter {
      case (name, _) => only.forall(_.contains(name))
    }
    selected.foreach { case (name, fn) =>
      // Operators return unordered plans (a verification-only global sort
      // inside an operator would be a full range-partition shuffle at scale
      // — VERDICT r1 "What's wrong" #2); the canonical row order lives only
      // here in the sink: all output columns left-to-right, nulls first,
      // mirroring the oracles' ORDER BY ALL NULLS FIRST. Output at the
      // verify scale (sf0.01) is small, so the single-partition write after
      // the sort is fine.
      try {
        val df = fn(spark, sfDir)
        val canonical = df.orderBy(
          df.columns.map(c => org.apache.spark.sql.functions.col(c).asc_nulls_first): _*)
        canonical.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // A thrown query writes no output and would otherwise just VANISH from
    // the driver's per-query scoreboard (round 9 lost q50/q51 exactly this
    // way) — make the round summary impossible to miss, on stdout AND
    // stderr, before the oracle dump.
    val summary = summaryLine(SparkEntry.queries.size, selected.size,
      filtered = only.isDefined, failed.toSeq)
    println(summary)
    System.err.println(summary)
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonStr.q(k)}: ${JsonStr.q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  /** The round-summary line, split out so its contract is spec-testable
    * (VerifySummarySpec): a FILTERED dev run must NEVER print the same
    * shape as the full gate — a grep for "all N queries dumped" once
    * mistook a filtered run for the full registry gate (ADVICE r11;
    * memory: full-gate-before-commit) — and a thrown query must be
    * impossible to miss (round 9 lost q50/q51 to a silent vanish). */
  private[graft] def summaryLine(registryTotal: Int, selectedTotal: Int,
      filtered: Boolean, failed: Seq[String]): String = {
    val scope =
      if (filtered) s"FILTERED ($selectedTotal of $registryTotal) " else ""
    if (failed.isEmpty) s"[verify] ${scope}all $selectedTotal queries dumped"
    else s"[verify] $scope${selectedTotal - failed.size}/$selectedTotal dumped; " +
      s"FAILED: ${failed.sorted.mkString(", ")}"
  }
}

/** JSON string escape shared by every oracle-sql dump ([[Verify]],
  * [[graft.diff.DiffVerify]]): backslash, quote, and ALL control chars
  * (<0x20) — a tab or CR in builder-authored SQL would otherwise make
  * the driver's json.load fail and silently zero the round's
  * correctness. ONE implementation on purpose: two copies drifted within
  * a day of the second appearing (review finding r12). */
private[graft] object JsonStr {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
