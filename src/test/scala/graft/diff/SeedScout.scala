package graft.diff

import org.apache.spark.sql.SparkSession

/** Dev utility behind the pinned-registry seeds (DiffOps): builds a seed
  * range of one forced grammar arm at sf0.001 and prints, per seed, the
  * row count, read class, evolution op, and the table's committed
  * operation sequence (read back from the snapshot files — the drawn
  * maintenance/expiry/rollback lifecycle is otherwise invisible in the
  * SQL). Used to select discriminating instances for q110–q127 pins
  * reproducibly instead of by eyeball:
  *
  *   sbt "Test/runMain graft.diff.SeedScout 14 1112 1170"
  */
object SeedScout {
  def main(args: Array[String]): Unit = {
    val arm = args(0).toInt
    val from = args(1).toLong
    val to = args(2).toLong
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
    for (seed <- from to to) {
      try {
        val g = QueryGen.gen(seed, Some(arm), lakeCap = Some(300))
        val n = g.build(spark, sfDir).count()
        val metas = java.nio.file.Files.list(tmp).toArray.map(_.toString)
          .filter(_.contains("graft-diff-lake"))
          .map(d => java.nio.file.Paths.get(d, "t", "meta"))
          .filter(java.nio.file.Files.exists(_))
        val opsList =
          if (metas.isEmpty) Seq.empty[String]
          else {
            val m = metas.maxBy(p => java.nio.file.Files.getLastModifiedTime(p).toMillis)
            java.nio.file.Files.list(m).toArray.map(_.toString)
              .filter(_.contains("snap-")).sorted.toSeq.map { f =>
                val j = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(f)))
                "\"operation\"\\s*:\\s*\"([^\"]+)\"".r
                  .findFirstMatchIn(j).map(_.group(1)).getOrElse("?")
              }
          }
        val kind = if (g.sql.contains("_change_type")) "CL" else "SCAN"
        val evo =
          if (g.sql.contains("g_extra")) "add"
          else if (g.sql.contains("AS BIGINT")) "promote" else "other"
        val pred = if (g.sql.contains(") g WHERE") || g.sql.contains(") h WHERE")) "pred" else "-"
        println(f"SEED $seed%-6d rows=$n%-5d $kind%-4s $evo%-8s $pred%-4s " +
          s"[${g.notes}] ops=${opsList.mkString(",")}")
        if (args.length > 4 && args(4) == "sql") println(s"  SQL $seed: ${g.sql}")
      } catch {
        case e: Throwable =>
          println(s"SEED $seed FAILED: ${Option(e.getMessage).getOrElse(e.toString).take(140)}")
      }
    }
    spark.stop()
  }
}
