package graft.lake

import java.nio.file.{Files => JFiles}
import graft.SparkSpec

/** Cross-PROCESS commit safety (VERDICT r11 #3/#4). The N-writer stress
  * test in LakeSpec races threads inside one JVM, where `synchronized`
  * already serializes the metadata swap; a real deployment has many
  * driver processes, so these tests fork genuinely separate JVMs against
  * one table directory and verify:
  *   - optimistic concurrency holds on the shared filesystem alone
  *     (O_EXCL snapshot create + rebase retry): linear gap-free history,
  *     no lost commits, no lost rows;
  *   - a writer killed between staging and snapshot publish (both the
  *     append and the upsert/delta windows) leaves readers untouched, and
  *     `Maintenance.removeOrphans` reclaims exactly the staged garbage.
  */
class ProcessSafetySpec extends SparkSpec {
  import spark.implicits._

  /** Fork a ProcessHelper JVM with this test JVM's classpath and module
    * flags (Test/fork := true makes java.class.path the real classpath). */
  private def fork(args: String*): Process = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val moduleFlags = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .sliding(2).collect { case Array("--add-opens", v) => Seq("--add-opens", v) }
      .flatten.toSeq
    val cmd = Seq(javaBin) ++ moduleFlags ++ Seq(
      "-Xmx2g", "-cp", System.getProperty("java.class.path"),
      "graft.lake.ProcessHelper") ++ args
    new ProcessBuilder(cmd: _*)
      .redirectOutput(ProcessBuilder.Redirect.DISCARD)
      .redirectError(ProcessBuilder.Redirect.INHERIT)
      .start()
  }

  private def newTable(dir: String): LakeTable =
    LakeTable.create(spark, dir, "proc_safety",
      Seq(("seed", "s", -1)).toDF("marker", "w", "i").schema,
      primaryKey = Seq("marker"))

  private def dataFilesOnDisk(t: LakeTable): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(t.location)
    (Seq("data", "deletes").flatMap { sub =>
      val d = new org.apache.hadoop.fs.Path(root, sub)
      if (!t.fs.exists(d)) Nil
      else {
        val it = t.fs.listFiles(d, true)
        val acc = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) acc += LakeTable.relativize(root, it.next().getPath)
        acc.toSeq
      }
    }).toSet
  }

  private def referenced(t: LakeTable): Set[String] =
    t.snapshots.flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path)).toSet

  test("two separate JVMs racing appends: linear gap-free history, no lost commits or rows") {
    val dir = JFiles.createTempDirectory("graft-proc-race").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))
    val perWriter = 4
    val ps = Seq("A", "B").map(w => fork("race", dir, w, perWriter.toString))
    ps.foreach { p =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "racer timed out")
      assert(p.exitValue() == 0, s"racer exited ${p.exitValue()}")
    }
    val t2 = LakeTable.load(spark, dir)
    // every marker from both writers arrived exactly once
    val markers = t2.scan().select("marker").as[String].collect().toSeq
    val expect = Seq("seed") ++ (for (w <- Seq("A", "B"); i <- 0 until perWriter) yield s"$w-$i")
    assert(markers.sorted == expect.sorted,
      s"lost/duplicated rows across process race: ${markers.sorted} vs ${expect.sorted}")
    // history is linear and gap-free: create + seed + 2*perWriter appends,
    // each snapshot's parent is exactly its predecessor
    val snaps = t2.snapshots.sortBy(_.seq)
    assert(snaps.map(_.seq) == (0L to (1 + 2 * perWriter).toLong),
      s"non-contiguous history: ${snaps.map(_.seq)}")
    snaps.tail.foreach(s => assert(s.parent.contains(s.seq - 1),
      s"snapshot ${s.seq} parent ${s.parent} breaks the chain"))
    // no commit lost a file: the head references every winner's files
    assert(referenced(t2).subsetOf(dataFilesOnDisk(t2)))
  }

  test("randomized concurrent-writer soak: mixed op classes race, final state " +
      "equals the serial replay of the committed history") {
    // VERDICT r18 #3: the pairwise races above pin one interleaving per
    // op class; this draws RANDOM mixed plans (appends vs upserts vs
    // deletes vs compaction vs evolution) for three JVMs from one seed
    // and checks linearizability — full invariants on ConcurrencySoak.
    // Bounded here; the longer seeded leg (more writers/ops/seeds) runs
    // via Test/runMain and is recorded in the round notes.
    ConcurrencySoak.runAndVerify(spark, writers = 3, opsPerWriter = 5, seed = 19L)
  }

  test("randomized SQL-route concurrent-writer soak: INSERT/MERGE/UPDATE/DELETE/" +
      "OVERWRITE/CALL/ALTER race through the catalog, final state equals the serial replay") {
    // VERDICT r19 #2: the imperative soak above races the LakeTable API;
    // the DSv2 delta path (task staging, commitStagedDelta conflict
    // checks, runtime group filtering) and the INSERT OVERWRITE replace
    // commit share the protocol but have route-specific staging and
    // conflict-classification code that only had pairwise deterministic
    // races. Three forked JVMs draw SqlSoak plans as SQL statements;
    // the four-part linearizability check runs with overwrite
    // re-baselining — full invariants on ConcurrencySoak.runAndVerifySql.
    // Bounded here; the longer seeded leg runs via
    // `Test/runMain graft.lake.ConcurrencySoak sql ...` (round notes).
    ConcurrencySoak.runAndVerifySql(spark, writers = 3, opsPerWriter = 5, seed = 31L)
  }

  test("randomized SQL-route soak under copy-on-write: group-replace restatements race") {
    // the COW half of the row-level surface: UPDATE/MERGE/DELETE route
    // through commitStagedReplaceFiles (runtime group filtering, swap
    // exactly the matched files) — the commit class whose stale-base
    // check the MoR soak never drives. The replay re-baselines at each
    // rewrite-dsv2 like at an overwrite; the fresh-append exactness
    // check is the lost-update tripwire for a rewrite that wrongly
    // drops a concurrent append's rows.
    ConcurrencySoak.runAndVerifySql(spark, writers = 3, opsPerWriter = 5, seed = 37L,
      mode = "copy-on-write")
  }

  test("changelog consumer following the re-baseline recipe converges under racing writers") {
    // the CDC-out consumer lifecycle under REAL concurrency (r19): while
    // forked writers race mixed op plans — including compaction
    // restatement barriers — the consumer incrementally folds changes()
    // and, on every barrier refusal, follows the rebaseline_changelog
    // recipe live (bootstrap scan, resume from rebaseline_seq). At
    // quiescence the folded replica must equal the head scan exactly.
    // This is the consumer the rebased-append visibility bug (soak seed
    // 102) would have silently starved of rows; the single-writer recipe
    // walk lives in EventStreamsSpec — this one races it.
    import spark.implicits._
    val wh = JFiles.createTempDirectory("graft-clrace").toString
    val dir = s"$wh/cl"
    val t = LakeTable.create(spark, dir, "cl",
      Seq(("seed", "s", -1)).toDF("marker", "w", "i").schema,
      primaryKey = Seq("marker"))
    t.append((0 until Soak.ContendedKeys).map(j => (s"k$j", "seed", -1))
      .toDF("marker", "w", "i"))
    val cat = "graft_clrace"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.sources.GraftCatalog].getName)
    val prevWh = spark.conf.getOption("spark.graft.catalog.warehouse")
    spark.conf.set("spark.graft.catalog.warehouse", wh)
    try {
      val names = Seq("A", "B", "C")
      val ps = names.map(w => fork("soak", dir, w, "4", "23"))
      var state = Map.empty[String, Map[String, Any]]
      def fold(df: org.apache.spark.sql.DataFrame): Unit = {
        val cols = df.columns.filterNot(_ == "_change_type").toSeq
        df.collect().foreach { r =>
          val key = r.getAs[String]("marker")
          if (r.getAs[String]("_change_type") == "delete") state -= key
          else state += key -> cols.map(c => c -> r.getAs[Any](c)).toMap
        }
      }
      var from = 0L
      var rebaselines = 0
      def consumeOnce(): Unit = {
        val t2 = LakeTable.load(spark, dir)
        val head = t2.currentSeq
        if (head <= from) return
        try { fold(t2.changes(from, head)); from = head }
        catch {
          case e: IllegalArgumentException
              if Option(e.getMessage).exists(_.contains("re-baseline")) =>
            val r = spark.sql(
              s"CALL $cat.system.rebaseline_changelog('cl', $from)").head()
            if (r.getAs[Boolean]("rebaseline_needed")) {
              state = Map.empty
              fold(spark.sql(r.getAs[String]("bootstrap_sql")))
              from = r.getAs[Long]("rebaseline_seq")
              rebaselines += 1
            }
        }
      }
      while (ps.exists(_.isAlive)) { consumeOnce(); Thread.sleep(150) }
      ps.zip(names).foreach { case (p, w) =>
        assert(p.waitFor(600, java.util.concurrent.TimeUnit.SECONDS) &&
          p.exitValue() == 0, s"writer $w failed")
      }
      // whether a LIVE refusal happened depends on poll timing (a consumer
      // parked exactly at a compaction's predecessor never crosses it), so
      // force one more barrier the consumer MUST cross: an upsert
      // guarantees a tombstone, compactDirty then really restates, and the
      // trailing append puts post-barrier data behind it
      val tEnd = LakeTable.load(spark, dir)
      tEnd.upsert(Seq(("k0", "t", 98)).toDF("marker", "w", "i"))
      tEnd.compactDirty()
      tEnd.append(Seq(("final", "t", 99)).toDF("marker", "w", "i"))
      // final drain to quiescence
      var guard = 0
      while (from < LakeTable.load(spark, dir).currentSeq && guard < 50) {
        consumeOnce(); guard += 1
      }
      assert(guard < 50, "consumer failed to converge after the writers exited")
      assert(rebaselines >= 1, "the recipe path was never exercised")
      // replica == head, name-aligned (schema may have evolved mid-run:
      // rows folded before an add-column lack the new column → null-fill;
      // the soak never writes non-null values into evolved columns)
      val headDf = LakeTable.load(spark, dir).scan()
      val headCols = headDf.columns.toSeq
      val served = headDf.collect().map(r =>
        r.getAs[String]("marker") -> headCols.map(c => c -> r.getAs[Any](c)).toMap).toMap
      val normalized = state.map { case (k, v) =>
        k -> headCols.map(c => c -> v.getOrElse(c, null)).toMap
      }
      val diverged = (normalized.keySet ++ served.keySet)
        .filter(k => normalized.get(k) != served.get(k))
      assert(diverged.isEmpty,
        s"replica diverged from head at ${diverged.toSeq.sorted.take(8)} " +
          s"(rebaselines=$rebaselines, from=$from)")
    } finally {
      prevWh match {
        case Some(v) => spark.conf.set("spark.graft.catalog.warehouse", v)
        case None => spark.conf.unset("spark.graft.catalog.warehouse")
      }
      spark.conf.unset(s"spark.sql.catalog.$cat")
    }
  }

  test("writer killed between append-stage and publish: readers unaffected, orphan sweep exact") {
    val dir = JFiles.createTempDirectory("graft-proc-crash").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))
    val before = t.scan().collect().toSet
    val liveBefore = referenced(t)

    val p = fork("crash-data", dir)
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "crasher timed out")
    assert(p.exitValue() == 137, s"expected halt(137), got ${p.exitValue()}")

    val t2 = LakeTable.load(spark, dir)
    // the crash staged real garbage (files moved into data/, unreferenced)
    val orphans = dataFilesOnDisk(t2) -- referenced(t2)
    assert(orphans.nonEmpty, "crash window left no staged files — failpoint moved?")
    // readers: content and history exactly as before the crash
    assert(t2.scan().collect().toSet == before)
    assert(referenced(t2) == liveBefore)
    // the sweep reclaims EXACTLY the staged garbage (cutoff in the future
    // so age-gating doesn't skip the seconds-old orphans)
    Maintenance.removeOrphans(t2, olderThanMs = -60000L)
    assert(dataFilesOnDisk(t2) -- referenced(t2) == Set.empty[String],
      "orphans survived the sweep")
    assert(referenced(t2) == liveBefore, "sweep touched referenced files")
    assert(LakeTable.load(spark, dir).scan().collect().toSet == before)
  }

  test("two JVMs racing DSv2 appends: linear history, no lost rows, no published-name collisions") {
    // the two-phase DataSourceV2 commit publishes files under names that
    // embedded only (seq, index, partition, task) — task ids restart per
    // SparkContext, so two processes at the same observed seq rendered
    // IDENTICAL destination paths (same cross-JVM bug the imperative
    // writer had; the staging UUID now rides into the name)
    val dir = JFiles.createTempDirectory("graft-proc-race-dsv2").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))
    val perWriter = 3
    val ps = Seq("A", "B").map(w => fork("race-dsv2", dir, w, perWriter.toString))
    ps.foreach { p =>
      assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "racer timed out")
      assert(p.exitValue() == 0, s"racer exited ${p.exitValue()}")
    }
    val t2 = LakeTable.load(spark, dir)
    val markers = t2.scan().select("marker").as[String].collect().toSeq
    val expect = Seq("seed") ++ (for (w <- Seq("A", "B"); i <- 0 until perWriter) yield s"$w-$i")
    assert(markers.sorted == expect.sorted,
      s"lost/duplicated rows across DSv2 process race: ${markers.sorted}")
    val snaps = t2.snapshots.sortBy(_.seq)
    assert(snaps.map(_.seq) == (0L to (1 + 2 * perWriter).toLong))
    snaps.tail.foreach(s => assert(s.parent.contains(s.seq - 1)))
  }

  test("writer killed between DSv2 publish-moves and snapshot commit: readers unaffected, sweep exact") {
    val dir = JFiles.createTempDirectory("graft-proc-crash-dsv2").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))
    val before = t.scan().collect().toSet
    val liveBefore = referenced(t)

    val p = fork("crash-dsv2", dir)
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "crasher timed out")
    assert(p.exitValue() == 137, s"expected halt(137), got ${p.exitValue()}")

    val t2 = LakeTable.load(spark, dir)
    val orphans = dataFilesOnDisk(t2) -- referenced(t2)
    assert(orphans.nonEmpty, "DSv2 crash window left no published-but-unreferenced files")
    assert(t2.scan().collect().toSet == before)
    Maintenance.removeOrphans(t2, olderThanMs = -60000L)
    assert(dataFilesOnDisk(t2) -- referenced(t2) == Set.empty[String])
    assert(referenced(t2) == liveBefore, "sweep touched referenced files")
    assert(LakeTable.load(spark, dir).scan().collect().toSet == before)
  }

  test("writer killed between delta-stage and publish: tombstones invisible, sweep reclaims both kinds") {
    val dir = JFiles.createTempDirectory("graft-proc-crashdelta").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1), ("doomed", "d", 7)).toDF("marker", "w", "i"))
    val before = t.scan().collect().toSet

    val p = fork("crash-delta", dir)
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "crasher timed out")
    assert(p.exitValue() == 137, s"expected halt(137), got ${p.exitValue()}")

    val t2 = LakeTable.load(spark, dir)
    val orphans = dataFilesOnDisk(t2) -- referenced(t2)
    // the upsert staged BOTH a data file and a delete-key sidecar
    assert(orphans.exists(_.startsWith("data/")), s"no orphan data file in $orphans")
    assert(orphans.exists(_.startsWith("deletes/")), s"no orphan delete file in $orphans")
    // the staged tombstone must NOT suppress the doomed row — it is
    // referenced by no snapshot
    assert(t2.scan().collect().toSet == before)
    Maintenance.removeOrphans(t2, olderThanMs = -60000L)
    assert(dataFilesOnDisk(t2) -- referenced(t2) == Set.empty[String])
    assert(LakeTable.load(spark, dir).scan().collect().toSet == before)
  }

  test("rollback racing cross-process appends: linear history, no lost appends, honest races") {
    // r16 (arm 12 made snapshot pinning first-class): rollbackTo is one
    // more optimistic commit, and across PROCESSES it can lose the
    // O_EXCL race to an append. The loser must surface the documented
    // ConcurrentModificationException (retried here, like a real
    // operator would), the appender's blind rebase must absorb losing
    // to a rollback, and the interleaving must leave a linear gap-free
    // history where every append survives — in history if a later
    // rollback unseated it from the head.
    import spark.implicits._
    val dir = JFiles.createTempDirectory("graft-proc-rollback").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))      // seq 1
    val target = t.snapshot(1L)
    val perWriter = 6
    val p = fork("race", dir, "A", perWriter.toString)
    var rollbacks = 0
    var lostRaces = 0
    val deadlineNs = System.nanoTime() + 150L * 1000 * 1000 * 1000
    while (p.isAlive && System.nanoTime() < deadlineNs) {
      try { t.rollbackTo(1L); rollbacks += 1 }
      catch { case _: java.util.ConcurrentModificationException => lostRaces += 1 }
      Thread.sleep(100)
    }
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "racer timed out")
    assert(p.exitValue() == 0, s"racer exited ${p.exitValue()}")
    assert(rollbacks >= 1, "no rollback ever landed — the race loop never ran")

    val t2 = LakeTable.load(spark, dir)
    val snaps = t2.snapshots.sortBy(_.seq)
    // linear, gap-free, parent-chained — no commit was lost or skipped
    assert(snaps.map(_.seq) == (0L to snaps.last.seq), s"gaps: ${snaps.map(_.seq)}")
    snaps.tail.foreach(s => assert(s.parent.contains(s.seq - 1),
      s"snapshot ${s.seq} parent ${s.parent} breaks the chain"))
    // every racer append committed exactly once (blind rebase absorbed
    // any losses to rollbacks): seed + perWriter append snapshots
    assert(snaps.count(_.operation == "append") == 1 + perWriter,
      s"append count: ${snaps.map(s => s.seq -> s.operation)}")
    // every rollback snapshot restored EXACTLY the target's file set
    val s1files = target.dataFiles.map(_.path).toSet
    snaps.filter(_.operation == "rollback").foreach(rb =>
      assert(rb.dataFiles.map(_.path).toSet == s1files,
        s"rollback ${rb.seq} content drifted"))
    // every append's marker is readable AT ITS OWN snapshot even when a
    // later rollback unseated it from the head (time travel keeps it)
    val appendSeqs = snaps.filter(s => s.operation == "append" && s.seq > 1).map(_.seq)
    appendSeqs.foreach { seq =>
      val markers = t2.scan(asOf = Some(seq)).select("marker").as[String].collect().toSet
      assert(markers.exists(_.startsWith("A-")),
        s"append snapshot $seq lost its own rows: $markers")
    }
    // no snapshot references a file that is not on disk
    assert(referenced(t2).subsetOf(dataFilesOnDisk(t2)))
  }

  test("ALTER killed between version-file publish and snapshot commit: readers unaffected, name reusable") {
    // the metadata-commit crash window: the schema-vNNN.json is durable
    // but no snapshot references it (an ORPHAN — the same artifact a lost
    // race leaves, here produced by a real cross-process kill). Readers
    // must be unaffected, and the crashed ALTER's own name must remain
    // addable — r16's orphan-guard fix proven against a genuine crash,
    // not just the in-JVM race injection.
    import spark.implicits._
    val dir = JFiles.createTempDirectory("graft-proc-metacrash").resolve("t").toString
    val t = newTable(dir)
    t.append(Seq(("seed", "s", -1)).toDF("marker", "w", "i"))
    val before = t.scan().collect().toSet
    val schemaFiles = () => {
      val meta = new org.apache.hadoop.fs.Path(t.location, "meta")
      t.fs.listStatus(meta).map(_.getPath.getName)
        .count(n => n.startsWith("schema-v") && n.endsWith(".json"))
    }
    val filesBefore = schemaFiles()

    val p = fork("crash-meta", dir)
    assert(p.waitFor(180, java.util.concurrent.TimeUnit.SECONDS), "meta crasher timed out")
    assert(p.exitValue() == 137, s"expected halt(137), got ${p.exitValue()}")

    val t2 = LakeTable.load(spark, dir)
    // the crash left a REAL orphan version file, and no snapshot moved
    assert(schemaFiles() == filesBefore + 1, "crash window left no orphan schema file")
    assert(t2.snapshots.map(_.operation).count(_ == "add-column") == 0)
    assert(t2.scan().collect().toSet == before)
    assert(!t2.currentSchema.fieldNames.contains("m_extra"))
    // the same name is still addable: the orphan is not live lineage
    assert(t2.addColumn("m_extra", "INT").operation == "add-column")
    assert(t2.currentSchema.fieldNames.contains("m_extra"))
    assert(t2.scan().select("marker", "m_extra").collect()
      .forall(_.isNullAt(1)), "old rows must null-fill the evolved column")
  }

  test("CDC ingest killed after a batch's commit, before its checkpoint: restart replays idempotently") {
    // VERDICT r16 #5: CdcIngestSpec proves IN-PROCESS replay idempotence
    // (C5); this kills the JVM inside the exact at-least-once window —
    // micro-batch 1's lake commit is durable but its streaming-checkpoint
    // record is not — restarts from the checkpoint in a fresh JVM, and
    // asserts the drained end state equals an uninterrupted run's.
    import graft.streaming.CdcIngest
    import org.apache.spark.sql.functions._
    val root = JFiles.createTempDirectory("graft-proc-cdc")
    val o = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"))
    val logDir = root.resolve("log").toString
    CdcIngest.writeChangeLog(spark, sfDir, logDir, nFiles = 4) // 4 micro-batches
    def mkTable(name: String): LakeTable = {
      val t = LakeTable.create(spark, root.resolve(name).toString, name,
        o.schema, primaryKey = Seq("o_orderkey"))
      t.append(o) // C1 snapshot, then the stream takes over
      t
    }
    // uninterrupted reference run (in this JVM)
    val ref = mkTable("ref")
    CdcIngest.ingest(ref, logDir, spark.read.parquet(logDir).schema,
      root.resolve("ckpt-ref").toString)
    val want = ref.scan().collect().toSet

    val crashed = mkTable("crashed")
    val dir = crashed.location
    val ckpt = root.resolve("ckpt-crash").toString
    val p = fork("cdc-crash", dir, logDir, ckpt, "1")
    assert(p.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "cdc crasher timed out")
    assert(p.exitValue() == 137, s"expected halt(137), got ${p.exitValue()}")
    // the crash window is real: batch 1's cdc commit IS on disk (create +
    // base append + 2 cdc commits), its checkpoint record is not
    val midSnaps = LakeTable.load(spark, dir).snapshots
    assert(midSnaps.count(_.operation == "cdc") == 2,
      s"crash landed outside the window: ${midSnaps.map(s => s.seq -> s.operation)}")

    val p2 = fork("cdc-drain", dir, logDir, ckpt)
    assert(p2.waitFor(300, java.util.concurrent.TimeUnit.SECONDS), "cdc resume timed out")
    assert(p2.exitValue() == 0, s"resume exited ${p2.exitValue()}")
    val t2 = LakeTable.load(spark, dir)
    // the unacknowledged batch REdelivered (its commit appears twice) ...
    assert(t2.snapshots.count(_.operation == "cdc") == 5,
      s"expected 2 + 3 cdc commits (batch 1 redelivered): " +
        s"${t2.snapshots.map(s => s.seq -> s.operation)}")
    // ... and last-writer-wins made the replay idempotent: end state
    // equals the uninterrupted run's, row for row
    assert(t2.scan().collect().toSet == want,
      "crash+resume state diverged from the uninterrupted run")
  }
}
