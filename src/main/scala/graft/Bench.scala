package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line the driver collects into BENCH_r{N}.json.
  *
  * Each query is run once to warm the JVM/codegen caches, then timed over
  * `Runs` measured executions (full materialization via count on a
  * cached-plan-free DataFrame — plans are rebuilt per run so Catalyst
  * work is included, Spark result caching is not used). The reported
  * per-query number is the MEDIAN of the runs (robust to a transient
  * machine-load spike contaminating one run; two past rounds recorded
  * phantom regressions from exactly that).
  *
  * A machine-load SENTINEL rides alongside: a fixed-work CPU busy loop
  * (deterministic arithmetic, no allocation) timed before every measured
  * run. Its medians are emitted raw plus a sentinel-normalized total
  * (total · nominal/observed), so a reader comparing two recordings can
  * adjudicate "slower code" vs "busier machine" without re-running.
  *
  * Three further contamination signals (added after observing this VM's
  * hypervisor steal parallel capacity in minutes-long episodes that the
  * serial sentinel cannot see — q68 swung 2.0 s → 25.7 s between
  * identical runs while the serial sentinel read ~nominal in both):
  * per-query MIN runtimes (`queries_min`/`total_min` — noise only adds
  * time, so the min is the faithful plan-cost estimate under episodic
  * steal), an all-core parallel sentinel (`par_sentinel_median_ms`,
  * ≈ the serial number on an idle host, inflates with lost parallel
  * capacity), and the /proc/stat hypervisor steal delta (`steal_sec`
  * total; per-run deltas in the detail sidecar).
  *
  * `SPARK_GRAFT_BENCH_ONLY=q68_x,q77_y` restricts to named queries (local
  * iteration); unset = the full bench set.
  */
object Bench {
  /** Fixed busy-loop work, calibrated to ~50 ms on an idle core of this
    * class of machine (the serial dependency chain runs ~2.2 ns/iter).
    * The mix (multiply/add/xor on a long) resists JIT elimination because
    * the result feeds the returned value. The absolute number is a
    * convention — adjudication compares the SAME sentinel across two
    * recordings on one machine; the normalized total is a convenience. */
  private val SentinelIters = 23_000_000L
  private def sentinelBody(): Long = {
    var acc = 0x9E3779B97F4A7C15L
    var i = 0L
    while (i < SentinelIters) {
      acc = acc * 6364136223846793005L + 1442695040888963407L
      acc ^= (acc >>> 33)
      i += 1
    }
    acc
  }
  private def sentinelOnce(): (Double, Long) = {
    val t0 = System.nanoTime()
    val acc = sentinelBody()
    ((System.nanoTime() - t0) / 1e6, acc)
  }

  /** PARALLEL-capacity sentinel: the serial sentinel cannot see a noisy
    * neighbor that leaves one vCPU healthy but steals from the other 31 —
    * exactly the contamination that hits a 32-thread Spark stage while the
    * serial loop still reads ~nominal (observed on this VM: q68 2.0 s →
    * 25.7 s between identical runs, serial sentinel ~48 ms in both). This
    * runs the SAME busy loop on every core at once and reports wall time:
    * on an idle host it ≈ the serial number; under parallel-capacity loss
    * it inflates by the same factor a real all-core stage suffers. */
  private def parSentinelOnce(pool: java.util.concurrent.ExecutorService,
      n: Int): (Double, Long) = {
    val t0 = System.nanoTime()
    val fs = (1 to n).map(_ => pool.submit(
      new java.util.concurrent.Callable[Long] { def call(): Long = sentinelBody() }))
    val acc = fs.map(_.get()).reduce(_ ^ _)
    ((System.nanoTime() - t0) / 1e6, acc)
  }

  /** Cumulative hypervisor steal seconds from /proc/stat (col 9), summed
    * over all cpus; -1 when unreadable. Deltas across a measured run tell
    * a reader how much CPU the host took DURING that run — the direct
    * evidence for "busier machine", where the sentinels are only proxies. */
  private def stealSec(): Double =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val jiffies = src.getLines().find(_.startsWith("cpu "))
          .map(_.trim.split("\\s+")(8).toLong).getOrElse(-100L)
        jiffies / 100.0 // USER_HZ=100 on linux
      } finally src.close()
    } catch { case _: Exception => -1.0 }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val only  = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val Runs = 5
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count() // materialize fully, skip driver collect
      (System.nanoTime() - t0) / 1e9
    }

    var sentinelGuard = 0L // consume busy-loop results so JIT keeps them
    val sentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val parSentinels = scala.collection.mutable.ArrayBuffer.empty[Double]
    val stealPerRun = scala.collection.mutable.ArrayBuffer.empty[Double]
    val cores = Runtime.getRuntime.availableProcessors
    val sentinelPool = java.util.concurrent.Executors.newFixedThreadPool(cores)
    sentinelOnce() // warm the sentinel's own JIT before first recording
    sentinelGuard ^= parSentinelOnce(sentinelPool, cores)._2
    val stealStart = stealSec()

    val benched = SparkEntry.benchQueries
      .filter(q => only.forall(_.contains(q.name)))
    val results = benched.map { q =>
      try {
        timeOnce(q.run) // warm-up (codegen, file listing, JIT)
        // one all-core capacity probe per query (per-run would burn
        // cores×50ms×Runs of bench wall time for little extra signal)
        val (pMs, pg) = parSentinelOnce(sentinelPool, cores)
        sentinelGuard ^= pg
        parSentinels += pMs
        val runs = (1 to Runs).map { _ =>
          val (sMs, g) = sentinelOnce()
          sentinelGuard ^= g
          sentinels += sMs
          val st0 = stealSec()
          val t = timeOnce(q.run)
          stealPerRun += (stealSec() - st0)
          t
        }
        (q.name, median(runs), runs)
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          (q.name, -1.0, Seq.empty[Double])
      }
    }
    sentinelPool.shutdown()
    val stealTotal = stealSec() - stealStart

    def fmt(v: Double): String = f"$v%.4f"
    def fmtArr(xs: Seq[Double]): String = xs.map(fmt).mkString("[", ",", "]")
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    // MIN alongside median: this VM's hypervisor steals parallel capacity
    // in minutes-long episodes, so all 5 runs of one query can be hit
    // (median fails) while the rest of the bench is clean. External noise
    // only ever ADDS time — the min is the faithful estimate of plan cost
    // on this machine; a reader comparing recordings should prefer it
    // whenever steal/sentinel evidence shows contamination.
    val qsMin = results.collect { case (k, v, rs) if v >= 0 && rs.nonEmpty =>
      "\"" + k + "\":" + fmt(rs.min) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalMin = results.collect { case (_, v, rs) if v >= 0 && rs.nonEmpty => rs.min }.sum
    val sentMed = if (sentinels.isEmpty) 0.0 else median(sentinels.toSeq)
    val parSentMed = if (parSentinels.isEmpty) 0.0 else median(parSentinels.toSeq)
    val NominalMs = 50.0 // the loop's target on an idle core
    val normalized = if (sentMed > 0) total * (NominalMs / sentMed) else total

    // The collector keeps only a bounded TAIL of stdout: round 7's single
    // fat line (per-run arrays + 170 sentinel samples) overflowed it and
    // the head of the JSON — metric, most medians — was cut, so nothing
    // parsed. The machine-readable PRIMARY line is now compact (medians +
    // sentinel median + normalized total only) and printed LAST; the full
    // run arrays and sentinel series go to a sidecar file for forensics.
    val detail =
      s"""{"runs":${results.map { case (k, _, rs) => "\"" + k + "\":" + fmtArr(rs) }
        .mkString("{", ",", "}")},""" +
      s""""sentinel_runs_ms":${fmtArr(sentinels.toSeq)},""" +
      s""""par_sentinel_per_query_ms":${fmtArr(parSentinels.toSeq)},""" +
      s""""steal_per_run_sec":${fmtArr(stealPerRun.toSeq)}}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      s"${sys.props("java.io.tmpdir")}/graft-bench-detail.json")
    try {
      val w = new java.io.PrintWriter(detailPath, "UTF-8")
      try w.println(detail) finally w.close()
    } catch { case e: Exception => System.err.println(s"[bench] detail write failed: $e") }

    // stop Spark BEFORE printing so the JSON is the last stdout line —
    // nothing (shutdown logging included) may trail the machine-readable
    // output the collector parses
    spark.stop()
    if (sentinelGuard == 42L) System.err.println("") // keep the guard live
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,""" +
      s""""queries_min":$qsMin,"total_min":${fmt(totalMin)},""" +
      s""""sentinel_nominal_ms":$NominalMs,"sentinel_median_ms":${fmt(sentMed)},""" +
      s""""par_sentinel_median_ms":${fmt(parSentMed)},"steal_sec":${fmt(stealTotal)},""" +
      s""""total_normalized":${fmt(normalized)},"detail":"$detailPath","sf":"$sfDir"}""")
    System.out.flush()
  }
}
