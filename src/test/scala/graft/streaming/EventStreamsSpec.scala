package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class EventStreamsSpec extends SparkSpec {
  import spark.implicits._

  test("streamed hourly window equals the batch hourly aggregation") {
    val streamed = EventStreams.drainToTable(
      spark,
      EventStreams.hourlyWindowed(EventStreams.eventsStream(spark, sfDir)),
      "spec_stream_hourly")
      .select("hour_bucket", "event_type", "n_events")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    assert(streamed == batch)
  }

  private def closedBatchSessions: Set[(Long, Long, java.sql.Timestamp, java.sql.Timestamp, Long)] = {
    // batch sessions minus each user's LAST session (still open at
    // end-of-data — the streaming form holds it in state)
    val all = EventStreams.sessionizeBatch(Tables.load(spark, sfDir, "events"))
      .as[EventStreams.Session].collect()
    val lastSid = all.groupBy(_.user_id).view.mapValues(_.map(_.session_id).max).toMap
    all.filter(s => s.session_id != lastSid(s.user_id))
      .map(s => (s.user_id, s.session_id, s.session_start, s.session_end, s.n_events)).toSet
  }

  test("flatMapGroupsWithState emits exactly the closed sessions of the batch form") {
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventStreams.Event]
    val streaming = EventStreams.sessionizeStream(events)
      .collect().map(s => (s.user_id, s.session_id, s.session_start, s.session_end, s.n_events))
      .toSet
    val batch = closedBatchSessions
    assert(streaming == batch,
      s"only-stream=${(streaming -- batch).take(3)} only-batch=${(batch -- streaming).take(3)}")
  }

  test("sessions spanning micro-batches merge once, no duplicates (two-batch drain)") {
    import java.nio.file.{Files, Path}
    val dir = Files.createTempDirectory("graft-session-stream")
    val events = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    // time-split into two "binlog segments": earlier half then later half
    val cut = events.selectExpr("percentile_approx(cast(ts as double), 0.5)").head().getDouble(0)
    val early = events.filter(col("ts").cast("double") <= cut)
    val late = events.filter(col("ts").cast("double") > cut)
    early.coalesce(1).write.parquet(dir.resolve("b0").toString)
    late.coalesce(1).write.parquet(dir.resolve("b1").toString)
    def onlyFile(p: Path): Path =
      Files.list(p).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val target = dir.resolve("stream")
    Files.createDirectory(target)
    // arrival order = modification time: b0 strictly before b1
    val f0 = Files.copy(onlyFile(dir.resolve("b0")), target.resolve("0.parquet"))
    val f1 = Files.copy(onlyFile(dir.resolve("b1")), target.resolve("1.parquet"))
    Files.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    Files.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(target.toString)
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeStream(stream).writeStream
      .format("memory").queryName("spec_sessions_2b")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("spec_sessions_2b")
      .as[EventStreams.Session]
      .collect().map(s => (s.user_id, s.session_id, s.session_start, s.session_end, s.n_events))
    assert(got.length == got.toSet.size, "duplicate session emissions across batches")
    assert(got.toSet == closedBatchSessions,
      "two-batch streaming result differs from batch closed sessions")
  }

  test("streaming gold refresh: foreachBatch upserts window aggregates into a lake table") {
    import java.nio.file.{Files => JFiles}
    val dir = JFiles.createTempDirectory("graft-goldstream")
    val events = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
    // two time-ordered segments: the boundary hour spans both batches, so
    // the test exercises cross-batch state + upsert restatement
    val cut = events.selectExpr("percentile_approx(cast(ts as double), 0.5)").head().getDouble(0)
    events.filter(col("ts").cast("double") <= cut)
      .coalesce(1).write.parquet(dir.resolve("b0").toString)
    events.filter(col("ts").cast("double") > cut)
      .coalesce(1).write.parquet(dir.resolve("b1").toString)
    def onlyFile(p: java.nio.file.Path) =
      JFiles.list(p).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val target = dir.resolve("stream")
    JFiles.createDirectory(target)
    val f0 = JFiles.copy(onlyFile(dir.resolve("b0")), target.resolve("0.parquet"))
    val f1 = JFiles.copy(onlyFile(dir.resolve("b1")), target.resolve("1.parquet"))
    JFiles.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    JFiles.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))

    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(target.toString)
    val agg = EventStreams.hourlyWindowed(stream)
    val batchAgg = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total_value"))
    val t = graft.lake.LakeTable.create(spark, dir.resolve("gold").toString, "gold_stream",
      batchAgg.schema, primaryKey = Seq("hour_bucket", "event_type"))
    EventStreams.streamAggToLake(agg, t, dir.resolve("ckpt").toString)
    // converged lake state == the batch aggregate, and >1 upsert commit ran
    assert(t.snapshots.count(_.operation == "upsert") >= 2, "expected one upsert per micro-batch")
    val got = t.scan().as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = batchAgg.as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got == want, s"only-stream=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
  }

  test("out-of-order event in a later micro-batch cannot regress the session end") {
    import java.nio.file.{Files => JFiles}
    import java.time.Instant
    val dir = JFiles.createTempDirectory("graft-ooo-session")
    def ts(min: Long) = java.sql.Timestamp.from(Instant.parse("2024-01-01T00:00:00Z").plusSeconds(min * 60))
    // batch 0: events at t0 and t0+10min (open session end = t0+10min)
    // batch 1: OUT-OF-ORDER event at t0+5min, then t0+45min closes the
    // session (gap from t0+10min = 35min > 30min). Without the clamp the
    // o-o-o event would drag end back to t0+5min.
    val b0 = Seq(EventStreams.Event(1L, 1L, ts(0), 1.0), EventStreams.Event(1L, 2L, ts(10), 1.0))
    val b1 = Seq(EventStreams.Event(1L, 3L, ts(5), 1.0), EventStreams.Event(1L, 4L, ts(45), 1.0))
    b0.toDF().coalesce(1).write.parquet(dir.resolve("f0").toString)
    b1.toDF().coalesce(1).write.parquet(dir.resolve("f1").toString)
    def onlyFile(p: java.nio.file.Path) =
      JFiles.list(p).filter(_.toString.endsWith(".parquet")).findFirst().get()
    val target = dir.resolve("stream")
    JFiles.createDirectory(target)
    val f0 = JFiles.copy(onlyFile(dir.resolve("f0")), target.resolve("0.parquet"))
    val f1 = JFiles.copy(onlyFile(dir.resolve("f1")), target.resolve("1.parquet"))
    JFiles.setLastModifiedTime(f0, java.nio.file.attribute.FileTime.fromMillis(1000000L))
    JFiles.setLastModifiedTime(f1, java.nio.file.attribute.FileTime.fromMillis(2000000L))
    val stream = spark.readStream.schema(b0.toDF().schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(target.toString)
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeStream(stream).writeStream
      .format("memory").queryName("spec_ooo_sessions")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("spec_ooo_sessions").as[EventStreams.Session].collect()
    assert(got.length == 1)
    assert(got.head.session_end == ts(10), s"session end regressed: ${got.head}")
    assert(got.head.n_events == 3L)
  }

  test("changelog stream plans append-only batches DIRECTLY from data files (no staging write)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-changelog-fast").toString
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val t = graft.lake.LakeTable.create(spark, s"$dir/t", "t", df.schema, primaryKey = Seq("id"))
    t.append(df)
    val fs = new org.apache.hadoop.fs.Path(t.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagingDir = new org.apache.hadoop.fs.Path(s"${t.location}/_staging")
    // observe staging from INSIDE each batch — post-commit cleanup would
    // hide a write that did happen
    @volatile var stagedSeen = false
    val rows = scala.collection.mutable.ListBuffer.empty[(Long, String, String)]
    def drain(): Unit = {
      val q = spark.readStream.format("graftlake")
        .option("path", t.location).option("changelog", "true").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("id", "s", "_change_type").as[(Long, String, String)].collect()
          rows.synchronized { rows ++= got }
          if (fs.exists(stagingDir) &&
            fs.listStatus(stagingDir).exists(_.getPath.getName.startsWith("changelog-")))
            stagedSeen = true
          ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // bootstrap over a purely append-only history: direct
    drain()
    assert(rows.toSet == Set((1L, "a", "insert"), (2L, "b", "insert")), s"bootstrap: $rows")
    assert(!stagedSeen, "append-only bootstrap batch staged a delta write")
    // incremental append: still direct
    rows.clear()
    t.append(Seq((3L, "c")).toDF("id", "s"))
    drain()
    assert(rows.toSet == Set((3L, "c", "insert")), s"append increment: $rows")
    assert(!stagedSeen, "append-only incremental batch staged a delta write")
    // an upsert in the range takes the join path (staging) and stays typed
    rows.clear()
    t.upsert(Seq((2L, "B2"), (4L, "d")).toDF("id", "s"))
    drain()
    assert(rows.toSet == Set((2L, "B2", "update"), (4L, "d", "insert")), s"upsert batch: $rows")
    assert(stagedSeen, "join-shaped batch should have used the staging path")
  }

  test("changelog stream converges to the batch changes result across upserts and deletes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-changelog-stream").toString
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")
    val t = graft.lake.LakeTable.create(spark, s"$dir/t", "t", df.schema, primaryKey = Seq("id"))
    t.append(df)
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "s"))
    t.deleteKeys(Seq(Tuple1(3L)).toDF("id"))

    // downstream materialization: apply typed deltas per batch to a state map
    val state = scala.collection.concurrent.TrieMap.empty[Long, String]
    val batches = scala.collection.mutable.ListBuffer.empty[Int]
    def drain(): Unit = {
      val q = spark.readStream.format("graftlake")
        .option("path", t.location).option("changelog", "true").load()
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val rows = b.select("id", "s", "_change_type")
            .as[(Long, String, String)].collect()
          batches.synchronized { batches += rows.length }
          rows.foreach {
            case (id, _, "delete") => state.remove(id)
            case (id, s, _)        => state.put(id, s)
          }
          ()
        }
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // bootstrap: full converged state as inserts (the upsert+delete history
    // would make the plain append stream refuse)
    drain()
    assert(state.toMap == Map(1L -> "a", 2L -> "B", 4L -> "d"), s"bootstrap wrong: $state")

    // incremental: more churn — upsert, MoR SQL delete, delta update
    t.upsert(Seq((1L, "A2"), (5L, "e")).toDF("id", "s"))
    t.deleteKeys(Seq(Tuple1(4L)).toDF("id"))
    drain()
    assert(state.toMap == Map(1L -> "A2", 2L -> "B", 5L -> "e"), s"increment wrong: $state")
    // stream state agrees with the table's own merged scan
    assert(t.scan().as[(Long, String)].collect().toMap == state.toMap)
    // and with the batch changelog applied over the same range
    assert(batches.sum >= 5, s"expected typed rows in both drains: $batches")

    // no new commits → empty batch, no rows
    val before = state.toMap
    drain()
    assert(state.toMap == before)

    // staging is cleaned up after commit
    val fs = new org.apache.hadoop.fs.Path(t.location)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagingDir = new org.apache.hadoop.fs.Path(s"${t.location}/_staging")
    val leftover =
      if (!fs.exists(stagingDir)) Array.empty[String]
      else fs.listStatus(stagingDir).map(_.getPath.getName).filter(_.startsWith("changelog-"))
    assert(leftover.isEmpty, s"changelog staging not cleaned: ${leftover.mkString(", ")}")

    // a restatement (compaction) inside the range still refuses loudly
    t.compactDirty()
    t.append(Seq((9L, "z")).toDF("id", "s"))
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException](drain())
    val msgs = Iterator.iterate[Throwable](err)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("restatement") || msgs.contains("compact"),
      s"restatement did not refuse actionably: $msgs")
  }

  test("lake-persistent incremental dedup: restart resumes from the state table alone, replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import java.nio.file.{Files => JFiles}
    val dir = JFiles.createTempDirectory("graft-lakededup")
    val stateLoc = dir.resolve("state").toString
    val keyed = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        graft.functions.TextSig.tokenSetKey(col("text")).as("group_key"))
      .as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = keyed.splitAt(keyed.length / 2)
    // one "pipeline session": a FRESH table handle (state must come from
    // disk, never a JVM-held DataFrame), a fresh stream, one drain
    def session(data: Seq[(Long, String)], startBatch: Long): Unit = {
      val t = graft.operators.DedupOps.survivorTable(spark, stateLoc)
      val stream = MemoryStream[(Long, String)]
      stream.addData(data)
      val q = stream.toDF().toDF("doc_id", "group_key").writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          graft.operators.DedupOps.lakeDedupStep(t, b, startBatch + id)
          ()
        }
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    session(h1, 0L) // first session ends here — every in-JVM handle dropped
    session(h2, 1L) // RESTART: new handle, new stream; state read from the table
    val expect = keyed.groupBy(_._2).view.mapValues(_.map(_._1).min)
      .toMap.map { case (k, id) => (id, k) }.toSet
    def served: Set[(Long, String)] =
      graft.lake.LakeTable.load(spark, stateLoc).scan()
        .select("doc_id", "group_key").as[(Long, String)].collect().toSet
    assert(served == expect,
      "lake-persistent dedup diverged from the in-memory min-per-key fold")
    val commitsAfterRun = graft.lake.LakeTable.load(spark, stateLoc).currentSeq
    // AT-LEAST-ONCE REPLAY (crash after append, before checkpoint commit):
    // re-presenting an already-applied batch must change nothing — the
    // anti-join finds every key served and lakeDedupStep skips the append
    session(h2, 1L)
    assert(served == expect, "replayed batch mutated the survivor state")
    assert(graft.lake.LakeTable.load(spark, stateLoc).currentSeq == commitsAfterRun,
      "replayed batch committed a snapshot despite zero fresh survivors")
  }

  test("rebaseline_changelog: a changelog consumer survives a compaction restatement via the emitted recipe") {
    // VERDICT r17 #4: changes() refuses restatements (correct) but
    // recovery was manual. The procedure computes the whole epoch
    // arithmetic; this test IS the consumer following it end to end.
    val wh = java.nio.file.Files.createTempDirectory("graft-rebaseline").toString
    val t = graft.lake.LakeTable.create(spark, s"$wh/ev", "ev",
      Seq((1L, "x")).toDF("id", "s").schema, primaryKey = Seq("id"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))    // seq 1
    t.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "s"))    // seq 2
    def fold(state: Map[Long, String], cdf: org.apache.spark.sql.DataFrame): Map[Long, String] =
      cdf.select("id", "s", "_change_type").as[(Long, String, String)].collect()
        .foldLeft(state) { case (m, (id, sv, ct)) =>
          if (ct == "delete") m - id else m + (id -> sv) }
    var state = fold(Map.empty, t.changes(0L, 2L))          // consumer at offset 2
    t.compactDirty()                                        // seq 3: restatement barrier
    t.append(Seq((4L, "d")).toDF("id", "s"))                // seq 4: post-barrier data
    // the naive resume refuses with the documented contract
    assert(intercept[IllegalArgumentException](t.changes(2L, t.currentSeq))
      .getMessage.contains("re-baseline"))
    spark.conf.set("spark.sql.catalog.graft_rb",
      classOf[graft.sources.GraftCatalog].getName)
    val prevWh = spark.conf.getOption("spark.graft.catalog.warehouse")
    spark.conf.set("spark.graft.catalog.warehouse", wh)
    try {
      val r = spark.sql("CALL graft_rb.system.rebaseline_changelog('ev', 2)").head()
      // summary row: barrier identified, epoch arithmetic exact
      assert(r.getAs[Long]("consumable_to") == 2L, r.toString)
      assert(r.getAs[Long]("barrier_seq") == 3L, r.toString)
      assert(r.getAs[String]("barrier_operation") == "compact", r.toString)
      assert(r.getAs[Boolean]("rebaseline_needed"), r.toString)
      assert(r.getAs[Long]("rebaseline_seq") == 4L, r.toString)
      // the recipe: (state was already consumed to consumable_to) rebuild
      // from the emitted bootstrap SQL VERBATIM, then resume changes()
      // from rebaseline_seq
      state = fold(Map.empty, spark.sql(r.getAs[String]("bootstrap_sql")))
      t.upsert(Seq((4L, "D"), (5L, "e")).toDF("id", "s"))   // seq 5: live again
      state = fold(state, t.changes(r.getAs[Long]("rebaseline_seq"), t.currentSeq))
      val expect = t.scan().select("id", "s").as[(Long, String)].collect().toMap
      assert(state == expect,
        s"recipe-recovered consumer state diverged: $state vs $expect")
      // a fully-replayable range reports no-op instead of prescribing a
      // pointless rebuild
      val r2 = spark.sql("CALL graft_rb.system.rebaseline_changelog('ev', 4)").head()
      assert(!r2.getAs[Boolean]("rebaseline_needed"), r2.toString)
      assert(r2.getAs[Long]("consumable_to") == t.currentSeq, r2.toString)
      assert(r2.isNullAt(r2.fieldIndex("bootstrap_sql")), r2.toString)
      // an expired checkpoint reports NULL consumable_to (nothing to
      // consume) and still hands out the bootstrap
      graft.lake.Maintenance.expireSnapshots(t, keep = 1, maxAgeMs = Some(-1000L))
      val r3 = spark.sql("CALL graft_rb.system.rebaseline_changelog('ev', 0)").head()
      assert(r3.isNullAt(r3.fieldIndex("consumable_to")), r3.toString)
      assert(r3.getAs[Boolean]("rebaseline_needed"), r3.toString)
      assert(r3.getAs[String]("barrier_operation").contains("expired"), r3.toString)
      assert(fold(Map.empty, spark.sql(r3.getAs[String]("bootstrap_sql"))) ==
        t.scan().select("id", "s").as[(Long, String)].collect().toMap)
    } finally {
      prevWh match {
        case Some(v) => spark.conf.set("spark.graft.catalog.warehouse", v)
        case None => spark.conf.unset("spark.graft.catalog.warehouse")
      }
    }
  }

  test("rebaseline_changelog: a checkpoint at the expiry boundary needs the pk base for row-restating ranges") {
    // review finding r18: changes(from, _) on a pk table also reads the
    // `from` BASE snapshot whenever the range is not append-only — a
    // checkpoint parked exactly at the expiry boundary (from = earliest-1)
    // has every range HEADER retained but no base, and the procedure used
    // to declare such ranges consumable while changes() refused them.
    val wh = java.nio.file.Files.createTempDirectory("graft-rebaseline-base").toString
    val t = graft.lake.LakeTable.create(spark, s"$wh/ev2", "ev2",
      Seq((1L, "x")).toDF("id", "s").schema, primaryKey = Seq("id"))
    t.append(Seq((1L, "a"), (2L, "b")).toDF("id", "s"))   // seq 1
    t.append(Seq((3L, "c")).toDF("id", "s"))              // seq 2 <- checkpoint
    t.upsert(Seq((2L, "B"), (4L, "d")).toDF("id", "s"))   // seq 3: restates a pk
    t.append(Seq((5L, "e")).toDF("id", "s"))              // seq 4
    graft.lake.Maintenance.expireSnapshots(t, keep = 2)   // earliest = 3
    assert(t.earliestSeq == 3L)
    // the dead end the procedure must predict: headers 3..4 retained, but
    // the upsert plans the pk base join against the expired seq-2 base
    assert(intercept[IllegalArgumentException](t.changes(2L, t.currentSeq))
      .getMessage.contains("re-baseline"))
    spark.conf.set("spark.sql.catalog.graft_rb2",
      classOf[graft.sources.GraftCatalog].getName)
    val prevWh = spark.conf.getOption("spark.graft.catalog.warehouse")
    spark.conf.set("spark.graft.catalog.warehouse", wh)
    try {
      val r = spark.sql("CALL graft_rb2.system.rebaseline_changelog('ev2', 2)").head()
      assert(r.getAs[Boolean]("rebaseline_needed"), r.toString)
      assert(r.getAs[Long]("barrier_seq") == 3L, r.toString)
      assert(r.getAs[String]("barrier_operation")
        .contains("needs the pk base snapshot 2"), r.toString)
      // nothing NEW is consumable (degenerate range [2,2] is empty)
      assert(r.getAs[Long]("consumable_to") == 2L, r.toString)
      // and the recipe converges the consumer
      val state = spark.sql(r.getAs[String]("bootstrap_sql"))
        .select("id", "s").as[(Long, String)].collect().toMap
      assert(state == t.scan().select("id", "s").as[(Long, String)].collect().toMap)
      // the complementary over-refusal check: same boundary checkpoint,
      // APPEND-ONLY range — the fast path never reads the base, so the
      // procedure must keep declaring it consumable and changes() agree
      val a = graft.lake.LakeTable.create(spark, s"$wh/ev3", "ev3",
        Seq((1L, "x")).toDF("id", "s").schema, primaryKey = Seq("id"))
      a.append(Seq((1L, "a")).toDF("id", "s"))            // seq 1 <- checkpoint
      a.append(Seq((2L, "b")).toDF("id", "s"))            // seq 2
      a.append(Seq((3L, "c")).toDF("id", "s"))            // seq 3
      graft.lake.Maintenance.expireSnapshots(a, keep = 2) // earliest = 2
      val r2 = spark.sql("CALL graft_rb2.system.rebaseline_changelog('ev3', 1)").head()
      assert(!r2.getAs[Boolean]("rebaseline_needed"), r2.toString)
      assert(r2.getAs[Long]("consumable_to") == 3L, r2.toString)
      assert(a.changes(1L, 3L).count() == 2L)
    } finally {
      prevWh match {
        case Some(v) => spark.conf.set("spark.graft.catalog.warehouse", v)
        case None => spark.conf.unset("spark.graft.catalog.warehouse")
      }
      spark.conf.unset("spark.sql.catalog.graft_rb2")
    }
  }

  test("incremental dedup state is bucket-stored and the anti-join never shuffles the survivor side") {
    // VERDICT r17 #2: the per-batch anti-join used to re-shuffle the
    // whole served state every step (linear-in-state exchange law). The
    // state table is now bucket(16, group_key)-partitioned and read
    // through the DSv2 catalog, so its KeyGroupedPartitioning satisfies
    // the join's distribution and only the BATCH side moves — assert the
    // plan shape structurally: zero Exchange above the state BatchScan,
    // and the batch side's SPJ shuffle present (key-grouped, one-side).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val wh = java.nio.file.Files.createTempDirectory("graft-dedup-spj").toString
    val t = graft.operators.DedupOps.survivorTable(spark, s"$wh/survivors")
    t.append((1L to 100L).map(i => (i, s"key$i", 0L))
      .toDF("doc_id", "group_key", "first_seen_batch"))
    val batch = (50L to 150L).map(i => (i + 1000L, s"key$i")).toDF("doc_id", "group_key")
    graft.operators.DedupOps.withSpjState(spark, wh) { state =>
      val fresh = graft.operators.DedupOps
        .freshSurvivors(state(), batch, 1L, nullSafeKeys = false)
      def strip(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan = strip(fresh.queryExecution.executedPlan)
      assert(plan.collectLeaves().exists(_.isInstanceOf[BatchScanExec]),
        s"state must be read via DSv2 to report its partitioning:\n$plan")
      val stateShuffles = plan.collect {
        case e: Exchange if e.collectLeaves().exists(_.isInstanceOf[BatchScanExec]) => e
      }
      assert(stateShuffles.isEmpty,
        s"survivor side of the anti-join still shuffles the state:\n$plan")
      assert(plan.toString.contains("keygroupedpartitioning"),
        s"batch side should shuffle onto the state's bucket function:\n$plan")
      // semantics unchanged vs the null-safe route: keys 50..100 are
      // served, 101..150 are fresh
      val got = fresh.select("group_key").as[String].collect().toSet
      assert(got == (101L to 150L).map(i => s"key$i").toSet, s"got ${got.size} keys")
    }
    // and the scale law the plan implies: appending MORE state must not
    // change the batch-side exchange count (state never re-shuffles)
    t.append((201L to 400L).map(i => (i, s"k2_$i", 1L))
      .toDF("doc_id", "group_key", "first_seen_batch"))
    graft.operators.DedupOps.withSpjState(spark, wh) { state =>
      val fresh2 = graft.operators.DedupOps
        .freshSurvivors(state(), batch, 2L, nullSafeKeys = false)
      def strip(p: SparkPlan): SparkPlan = p match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val plan2 = strip(fresh2.queryExecution.executedPlan)
      assert(plan2.collect {
        case e: Exchange if e.collectLeaves().exists(_.isInstanceOf[BatchScanExec]) => e
      }.isEmpty, s"grown state re-introduced a survivor-side shuffle:\n$plan2")
    }
  }

  test("sessions respect the gap invariant: intra-session gaps <= 30 min, sessions ordered") {
    val sessions = EventStreams.sessionizeBatch(Tables.load(spark, sfDir, "events"))
    // session_end >= session_start, and per user sessions don't overlap
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
    val overlaps = sessions.alias("a").join(sessions.alias("b"),
      col("a.user_id") === col("b.user_id") &&
        (col("a.session_id") + 1) === col("b.session_id") &&
        expr("unix_micros(b.session_start) - unix_micros(a.session_end)") <= lit(EventStreams.SessionGapSeconds * 1000000L))
    assert(overlaps.count() == 0, "consecutive sessions closer than the gap")
  }
}
