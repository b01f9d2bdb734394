package graft.lake

import org.apache.hadoop.fs.Path

/** Table maintenance jobs (reference: `auto_compact` at a 10-file
  * threshold and snapshot expiry with max-age/min-keep,
  * olake-config/destination.json:92-93,262-267). All of these operate on
  * snapshot metadata plus bulk file IO — no query-path coupling. */
object Maintenance {

  /** Number of data files at which [[compactIfNeeded]] rewrites
    * (reference: destination.json:262-263 `auto_compact: 10 files`). */
  val AutoCompactFileThreshold = 10

  /** Partition-scoped compaction ([[LakeTable.compactDirty]]): rewrites
    * only partitions that are over-full or tombstone-hit, folds all delete
    * files, keeps clean partitions' file entries verbatim. Bin-packs small
    * files (ingest commits one file per partition value per batch;
    * compaction collapses B batches × P partitions back to ~P files) and
    * re-sorts on the clustering keys. Time travel to pre-compaction
    * snapshots still works — replaced files stay on disk until
    * [[expireSnapshots]] drops the snapshots that reference them. */
  def compact(table: LakeTable, targetFilesPerPartition: Int = 1): Snapshot =
    table.compactDirty(targetFilesPerPartition)

  /** Auto-compact policy: rewrite when data files OR delete files pile up
    * past their thresholds. Delete files get their own threshold (not
    * "any exist"): every MoR upsert commit leaves one, and compacting on
    * the first would turn each CDC batch into the O(table) rewrite the
    * merge-on-read design exists to avoid. */
  def compactIfNeeded(
      table: LakeTable,
      threshold: Int = AutoCompactFileThreshold,
      deleteThreshold: Int = AutoCompactFileThreshold): Option[Snapshot] = {
    val s = table.currentSnapshot
    if (s.dataFiles.size >= threshold || s.deleteFiles.size >= deleteThreshold)
      Some(compact(table))
    else None
  }

  /** Expire history, then delete every data/delete file referenced only by
    * the expired snapshots. The policy mirrors the reference
    * (destination.json:92-93: max age 5 days AND keep ≥ 5): a snapshot is
    * expired only when it is BOTH beyond the last `keep` AND — when
    * `maxAgeMs` is given — older than the age cutoff. The age scan is a
    * `takeWhile`, not a `filter`: commit timestamps are EXPECTED monotone
    * with seq, but a backwards host-clock step can produce an interior
    * snapshot younger than its successor, and a filter would then expire
    * an INTERIOR snapshot — tearing a hole in the gap-free retained
    * history that every consumer assumes (`currentSeq` forward probing,
    * `changes`'s O(1) boundary probes, the streaming sources' earliest-
    * seq guards). takeWhile stops at the first young-enough snapshot, so
    * expiry removes a contiguous prefix BY CONSTRUCTION and retained
    * snapshots stay fully readable (review finding r17). */
  def expireSnapshots(table: LakeTable, keep: Int, maxAgeMs: Option[Long] = None): Unit = {
    require(keep >= 1, "must keep at least the current snapshot")
    val all = table.snapshots
    if (all.size <= keep) return
    val candidates = all.dropRight(keep)
    val cutoff = maxAgeMs.map(a => System.currentTimeMillis() - a)
    val expired = cutoff match {
      case Some(c) => candidates.takeWhile(_.timestampMs < c)
      case None    => candidates
    }
    if (expired.isEmpty) return
    val expiredSeqs = expired.map(_.seq).toSet
    val retained = all.filterNot(s => expiredSeqs(s.seq))
    val live: Set[String] =
      retained.flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path)).toSet
    val dead = expired
      .flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path))
      .distinct.filterNot(live)

    // manifests are SHARED across snapshots (commits re-reference their
    // parent's): delete one only when no retained snapshot points at it
    val liveManifests: Set[String] =
      retained.flatMap(s => table.snapshotFile(s.seq).manifests.map(_.path)).toSet
    val deadManifests = expired
      .flatMap(s => table.snapshotFile(s.seq).manifests.map(_.path))
      .distinct.filterNot(liveManifests)

    // Persist the expired snapshots' schema lineage BEFORE any deletion:
    // the dropped-column-name guard (LakeTable.addColumn) derives "this
    // version once held data" from snapshot references, and expiring the
    // last snapshot that references a dropped column's schema version
    // must not let the name be re-added while still-live data files hold
    // stale physical values under it. Record-then-delete is crash-safe —
    // a crash after the record only over-records, which is conservative.
    table.recordRetiredSchemaVersions(expired.map(_.schemaVersion).toSet)

    val root = new Path(table.location)
    dead.foreach(p => table.fs.delete(new Path(root, p), false))
    deadManifests.foreach(p => table.fs.delete(new Path(root, p), false))
    expired.foreach(s => table.fs.delete(new Path(root, f"meta/snap-${s.seq}%05d.json"), false))
  }

  /** Default orphan age cutoff (3 days) — mirrors Iceberg's
    * remove_orphan_files `older_than` default of leaving recent files
    * alone, so an IN-FLIGHT write's staging directory is never swept out
    * from under it mid-commit. */
  val DefaultOrphanAgeMs: Long = 3L * 24 * 3600 * 1000

  /** Sweep leftovers from crashed commits, age-gated so concurrent
    * in-flight writes are untouched:
    *   - `_staging/<uuid>` subdirectories older than `olderThanMs`
    *     (files staged but never moved are unreferenced by construction);
    *   - `data/` and `deletes/` files REFERENCED BY NO snapshot and older
    *     than `olderThanMs` — the leak path of a commit that crashed
    *     between moving staged files into `data/` and writing the
    *     snapshot (e.g. a DSv2 two-phase commit dying mid-publish).
    */
  def removeOrphans(table: LakeTable, olderThanMs: Long = DefaultOrphanAgeMs): Unit = {
    val cutoff = System.currentTimeMillis() - olderThanMs
    val root = new Path(table.location)
    val staging = new Path(root, "_staging")
    if (table.fs.exists(staging))
      table.fs.listStatus(staging)
        .filter(_.getModificationTime < cutoff)
        .foreach(st => table.fs.delete(st.getPath, true))

    val live: Set[String] = table.snapshots
      .flatMap(s => s.dataFiles.map(_.path) ++ s.deleteFiles.map(_.path)).toSet
    Seq("data", "deletes").foreach { sub =>
      val dir = new Path(root, sub)
      if (table.fs.exists(dir)) {
        val it = table.fs.listFiles(dir, true)
        while (it.hasNext) {
          val st = it.next()
          val rel = LakeTable.relativize(root, st.getPath)
          if (!live(rel) && st.getModificationTime < cutoff)
            table.fs.delete(st.getPath, false)
        }
      }
    }

    // manifests stranded by a commit that lost the snapshot race (or died
    // before publishing its snapshot) — referenced by nothing, age-gated
    val metaDir = new Path(root, "meta")
    val snapSeqs = table.fs.listStatus(metaDir).map(_.getPath.getName)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
      .map(_.stripPrefix("snap-").stripSuffix(".json").toLong)
    val liveManifests: Set[String] =
      snapSeqs.flatMap(q => table.snapshotFile(q).manifests.map(_.path)).toSet
    table.fs.listStatus(metaDir)
      .filter { st =>
        val n = st.getPath.getName
        (n.startsWith("man-") && n.endsWith(".json") && !liveManifests(s"meta/$n") ||
          // hidden publish temps stranded by a writer killed mid
          // stage-and-link (createExclusive); invisible to every reader
          // (listings filter on real prefixes), swept here age-gated
          n.startsWith(".") && n.endsWith(".tmp")) &&
          st.getModificationTime < cutoff
      }
      .foreach(st => table.fs.delete(st.getPath, false))
  }
}
