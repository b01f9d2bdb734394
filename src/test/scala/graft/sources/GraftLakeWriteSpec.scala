package graft.sources

import graft.SparkSpec
import graft.lake.{LakeTable, PartitionField, Transform}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class GraftLakeWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshLoc(): String =
    Files.createTempDirectory("graft-dsv2-write").resolve("t").toString

  test("DSv2 append roundtrips through both the DSv2 and imperative read paths") {
    val loc = freshLoc()
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    LakeTable.create(spark, loc, "t", df.schema, clusterBy = Seq("id"))
    df.write.format("graftlake").option("path", loc).mode("append").save()

    val t = LakeTable.load(spark, loc)
    assert(t.currentSnapshot.operation == "append-dsv2")
    assert(t.scan().as[(Long, String, Double)].collect().toSet ==
      Set((1L, "a", 1.5), (2L, "b", 2.5)))
    val viaDsv2 = spark.read.format("graftlake").option("path", loc).load()
      .as[(Long, String, Double)].collect().toSet
    assert(viaDsv2 == Set((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("DSv2 append renders partition transforms per row; pruning works on the result") {
    val loc = freshLoc()
    val ts = (d: String) => java.sql.Timestamp.valueOf(d)
    val df = Seq(
      (1L, ts("2020-01-15 10:00:00"), "x"),
      (2L, ts("2020-06-15 10:00:00"), "y"),
      (3L, ts("2020-06-20 11:00:00"), "y"),
    ).toDF("id", "ts", "s")
    LakeTable.create(spark, loc, "t", df.schema,
      partitionSpec = Seq(
        PartitionField("ts", Transform.Month, "p_month"),
        PartitionField("s", Transform.Identity, "p_s")))
    df.write.format("graftlake").option("path", loc).mode("append").save()

    val t = LakeTable.load(spark, loc)
    val parts = t.currentSnapshot.dataFiles.map(_.partition).toSet
    assert(parts == Set(
      Map("p_month" -> "2020-01", "p_s" -> "x"),
      Map("p_month" -> "2020-06", "p_s" -> "y")))
    // transform-aware pruning over DSv2-written files (file count per
    // partition value depends on task layout; the January file must drop)
    val (kept, total) = t.planFiles(t.currentSnapshot, Seq(
      graft.lake.PruneFilter.Ge("ts", ts("2020-06-01 00:00:00"))))
    assert(kept.nonEmpty && kept.size < total)
    assert(kept.forall(_.partition("p_month") == "2020-06"))
    assert(t.scan().count() == 3)
  }

  test("DSv2 and imperative appends interleave on one table") {
    val loc = freshLoc()
    val df1 = Seq((1L, "dsv2")).toDF("id", "src")
    LakeTable.create(spark, loc, "t", df1.schema)
    df1.write.format("graftlake").option("path", loc).mode("append").save()
    val t = LakeTable.load(spark, loc)
    t.append(Seq((2L, "imperative")).toDF("id", "src"))
    df1.select(lit(3L).as("id"), lit("dsv2-again").as("src"))
      .write.format("graftlake").option("path", loc).mode("append").save()
    assert(LakeTable.load(spark, loc).scan().as[(Long, String)].collect().toSet ==
      Set((1L, "dsv2"), (2L, "imperative"), (3L, "dsv2-again")))
    // MoR still works over mixed files: delete one key
    val t2 = LakeTable.load(spark, loc)
    // (no primary key on this table: re-create scenario with pk)
    assert(t2.snapshots.map(_.operation) ==
      Seq("create", "append-dsv2", "append", "append-dsv2"))
  }

  test("DSv2 write requests clustered distribution: one file per partition value, sorted keys") {
    val loc = freshLoc()
    // 200 rows across 2 partition values from MANY input partitions —
    // without RequiresDistributionAndOrdering every task that sees a value
    // opens a writer for it (files ≈ tasks × values); with the requested
    // clustering each value funnels to one task → one file
    val df = spark.range(0, 200, 1, 8)
      .selectExpr("id", "CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END AS s")
    LakeTable.create(spark, loc, "t", df.schema,
      partitionSpec = Seq(graft.lake.PartitionField("s", graft.lake.Transform.Identity, "p_s")),
      clusterBy = Seq("id"))
    df.write.format("graftlake").option("path", loc).mode("append").save()
    val files = LakeTable.load(spark, loc).currentSnapshot.dataFiles
    val perValue = files.groupBy(_.partition("p_s")).view.mapValues(_.size).toMap
    assert(perValue.keySet == Set("A", "B"))
    assert(perValue.values.forall(_ == 1),
      s"distribution request ignored — files per partition value: $perValue")
    // in-file ordering on the cluster key → tight id bounds per file
    files.foreach { f =>
      val b = f.bounds.get("id")
      assert(b.nonEmpty, "no id bounds recorded")
    }
    assert(LakeTable.load(spark, loc).scan().count() == 200)
  }

  test("DSv2-written rows respect tombstones from later upserts (seq embedding)") {
    val loc = freshLoc()
    val df = Seq((1L, "v1"), (2L, "v1")).toDF("id", "s")
    LakeTable.create(spark, loc, "t", df.schema, primaryKey = Seq("id"))
    df.write.format("graftlake").option("path", loc).mode("append").save()
    val t = LakeTable.load(spark, loc)
    t.upsert(Seq((1L, "v2")).toDF("id", "s"))
    assert(t.scan().as[(Long, String)].collect().toSet == Set((1L, "v2"), (2L, "v1")))
    val viaDsv2 = spark.read.format("graftlake").option("path", loc).load()
      .as[(Long, String)].collect().toSet
    assert(viaDsv2 == Set((1L, "v2"), (2L, "v1")))
  }

  test("a DSv2 write planned one schema era back survives a racing ADD COLUMN; " +
      "a shape matching no era still refuses") {
    // r20 SQL-route soak finding (seed 201 family): an INSERT analyzed
    // just before a concurrent ALTER declared the PREVIOUS era's shape,
    // and the writer-factory validation demanded the CURRENT schema —
    // crashing a legitimate write with a raw IllegalArgumentException on
    // exactly the shape schema evolution exists to support (the
    // imperative append's blind rebase has always committed it; files
    // predate evolved columns routinely, readers NULL-fill by name).
    // Deterministic pin at the write-factory layer: hand the batch write
    // the stale era's schema explicitly.
    val loc = freshLoc()
    val df = Seq(("k1", "a", 1)).toDF("marker", "w", "i")
    val t = LakeTable.create(spark, loc, "t", df.schema, primaryKey = Seq("marker"))
    t.append(df)
    val oldSchema = t.schema(t.currentSnapshot.schemaVersion)
    t.addColumn("g_race", "INT") // the racing evolution
    val info = new org.apache.spark.sql.connector.write.PhysicalWriteInfo {
      override def numPartitions(): Int = 1
    }
    // stale era: factory creation must succeed (the shape matches era 0)
    new GraftLakeBatchWrite(t, writeSchema = Some(oldSchema))
      .createBatchWriterFactory(info)
    // and end-to-end: committing old-era rows through DSv2 lands, reads
    // NULL-fill the evolved column
    Seq(("x", "b", 2)).toDF("marker", "w", "i")
      .write.format("graftlake").option("path", loc).mode("append").save()
    val head = LakeTable.load(spark, loc).scan()
    assert(head.count() == 2)
    assert(head.filter(col("marker") === "x").select("g_race").head().isNullAt(0))
    // a shape that matches NO era is a genuinely wrong write — refused
    val bogus = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("nope",
        org.apache.spark.sql.types.LongType)))
    intercept[IllegalArgumentException](
      new GraftLakeBatchWrite(t, writeSchema = Some(bogus))
        .createBatchWriterFactory(info))
  }
}
