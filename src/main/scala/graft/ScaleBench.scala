package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-curve measurement (VERDICT r11 #1 — "measure scale,
  * don't just argue it"). Synthesizes a ~10× corpus from the sf0.1
  * fixture with deterministic id offsets, runs the dedup/curation
  * headline set plus the q1 scan-agg on BOTH scales, and emits one JSON
  * line (plus a `SCALE_r12.json` sidecar) recording per-query wall time,
  * row counts, time ratio, and a plan-shape comparison.
  *
  * Corpus construction — linear ground truth by design:
  *   - `documents` is replicated K times with `doc_id + k·10⁷` and every
  *     token PREFIXED `c<k>_`. The prefix is a bijection on each copy's
  *     token space, so within-copy shingle/token-set/minhash structure is
  *     IDENTICAL to the base corpus while cross-copy token sets are
  *     disjoint — no near-dup pair can span copies. A K× corpus therefore
  *     carries exactly K× the pair/survivor/component structure: the
  *     ideal scaling run answers "does wall time grow ~linearly when the
  *     WORK grows exactly linearly", with no quadratic pair blow-up
  *     confounding the curve (naive replication would make every doc a
  *     10-way exact duplicate and square the output instead).
  *   - `orders` is replicated with `o_orderkey + k·10⁷`, other columns
  *     verbatim (aggregate queries are insensitive to duplication).
  *   - the 1× baseline is built through the SAME transform (K=1), so
  *     both measurements see identical token shapes and file layouts.
  *
  * Recorded per query: min-of-3 wall seconds at 1× and 10×, output rows
  * at both scales, `rows_linear` (rows₁₀ == 10·rows₁ for the
  * structure-carrying queries; q1's group count is scale-invariant), and
  * `plan_same` (the multiset of physical-plan node class names is
  * unchanged — scaling must not introduce new plan shapes, e.g. a
  * broadcast silently degrading to a sort-merge join).
  */
object ScaleBench {

  private val Copies = 10
  private val IdStride = 10_000_000L

  /** Queries measured, with the expected 10×-rows behavior. */
  private val Headline: Seq[(String, String)] = Seq(
    "q1_orders_by_status" -> "invariant", // group-by status: rows = |statuses|
    "q38_minhash_neardup_pairs" -> "linear",
    "q68_jaccard_similarity_join" -> "linear",
    "q99_neardup_components" -> "linear",
    "q103_curation_pipeline" -> "invariant", // (lang, source) rollup: group count fixed

    "q107_duplicate_spans" -> "linear",
    "q108_incremental_dedup" -> "linear")

  private def buildFixture(spark: SparkSession, base: String, out: String, k: Int): Unit = {
    val done = new java.io.File(s"$out/_SCALE_DONE")
    if (done.exists()) return
    new java.io.File(out).mkdirs()
    val docs = spark.read.parquet(s"$base/documents.parquet")
    val docCopies = (0 until k).map { c =>
      docs
        .withColumn("doc_id", col("doc_id") + lit(c * IdStride))
        .withColumn("text",
          array_join(transform(split(col("text"), " "),
            t => concat(lit(s"c${c}_"), t)), " "))
    }
    docCopies.reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    (0 until k).map(c => orders.withColumn("o_orderkey", col("o_orderkey") + lit(c * IdStride)))
      .reduce(_ unionAll _)
      .repartition(32).write.mode("overwrite").parquet(s"$out/orders.parquet")
    // remaining tables pass through by symlink: loaders see a complete dir
    Tables.names.filterNot(n => n == "documents" || n == "orders").foreach { n =>
      val link = java.nio.file.Paths.get(s"$out/$n.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$base/$n.parquet"))
    }
    java.nio.file.Files.writeString(done.toPath, s"copies=$k\n")
  }

  private def planNodes(df: DataFrame): Map[String, Int] =
    df.queryExecution.executedPlan.collect { case n => n.getClass.getSimpleName }
      .groupBy(identity).view.mapValues(_.size).toMap

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SCALE_BASE", "/root/testdata/sf0.1")
    val work = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft-scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .appName("graft-scale-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir1 = s"$work/x1"
    val dir10 = s"$work/x$Copies"
    buildFixture(spark, base, dir1, 1)
    buildFixture(spark, base, dir10, Copies)

    def measure(name: String, dir: String): (Double, Long, Map[String, Int]) = {
      val fn = SparkEntry.queries(name)
      fn(spark, dir).queryExecution.toRdd.count() // warm-up: codegen/JIT/listing
      var rows = 0L
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, dir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows, planNodes(fn(spark, dir)))
    }

    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val entries = Headline.map { case (name, rowsLaw) =>
      val (t1, r1, p1) = measure(name, dir1)
      val (t10, r10, p10) = measure(name, dir10)
      val ratio = if (t1 > 0) t10 / t1 else -1.0
      val rowsLinear = rowsLaw match {
        case "linear" => r10 == Copies * r1
        case _        => r10 == r1
      }
      System.err.println(s"[scale] $name 1x=${fmt(t1)}s ${r1}r  ${Copies}x=${fmt(t10)}s ${r10}r  " +
        s"ratio=${fmt(ratio)} rows_${rowsLaw}_ok=$rowsLinear plan_same=${p1 == p10}")
      s""""$name":{"t1":${fmt(t1)},"t10":${fmt(t10)},"ratio":${fmt(ratio)},""" +
        s""""rows1":$r1,"rows10":$r10,"rows_law":"$rowsLaw","rows_ok":$rowsLinear,""" +
        s""""plan_same":${p1 == p10}}"""
    }
    val json = s"""{"copies":$Copies,"base":"$base","queries":{${entries.mkString(",")}}}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_r12.json")), json + "\n")
    catch { case e: Exception => System.err.println(s"[scale] sidecar write failed: $e") }
    spark.stop()
    println(json)
  }
}
