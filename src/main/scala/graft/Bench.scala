package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line the driver collects into BENCH_r{N}.json.
  *
  * Each query is run once to warm the JVM/codegen caches, then timed over
  * the best of `RUNS` measured executions (full materialization via
  * count on a cached-plan-free DataFrame — plans are rebuilt per run so
  * Catalyst work is included, Spark result caching is not used).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
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

    val Runs = 3
    def timeOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count() // materialize fully, skip driver collect
      (System.nanoTime() - t0) / 1e9
    }

    val results = SparkEntry.benchQueries.map { q =>
      try {
        timeOnce(q.run) // warm-up (codegen, file listing, JIT)
        val best = (1 to Runs).map(_ => timeOnce(q.run)).min
        q.name -> best
      } catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          q.name -> -1.0
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // stop Spark BEFORE printing so the JSON is the last stdout line —
    // nothing (shutdown logging included) may trail the machine-readable
    // output the collector parses
    spark.stop()
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    System.out.flush()
  }
}
