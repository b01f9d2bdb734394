package graft

/** JVM-scoped temp directories with guaranteed recursive cleanup
  * (ADVICE r12: `incrementalDedupLake` created a fresh lake-state dir per
  * invocation and never deleted it — Bench re-executes the plan dozens of
  * times per round, so orphan state dirs accumulated in /tmp across
  * rounds). `File.deleteOnExit` cannot reclaim a non-empty directory, so
  * a single shutdown hook walks each registered root depth-first instead.
  *
  * Dirs are created per CALL (not reused) on purpose: q116's semantics
  * are "a fresh pipeline run end to end", and serving a warm state table
  * to the next bench iteration would silently turn its measured appends
  * into no-op replays. The leak is bounded to one JVM's lifetime and
  * reclaimed at exit.
  */
private[graft] object TempDirs {

  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread("graft-tempdir-sweep") {
      override def run(): Unit = {
        roots.forEach { root =>
          try deleteRecursively(root)
          catch { case _: Exception => () } // best-effort: never block exit
        }
      }
    })
  }

  /** Recursive delete, symlink-safe (never follows links). Exposed so a
    * caller that REUSES one scoped root across many invocations (ScaleBench
    * lake variants, ADVICE r14 #3) can wipe the previous copy before
    * writing the next, instead of accumulating copies until shutdown. */
  private[graft] def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (java.nio.file.Files.isDirectory(p,
        java.nio.file.LinkOption.NOFOLLOW_LINKS)) {
      val s = java.nio.file.Files.list(p)
      try s.forEach(deleteRecursively) finally s.close()
    }
    java.nio.file.Files.deleteIfExists(p)
  }

  /** A fresh temp directory removed (recursively) at JVM shutdown. */
  def scoped(prefix: String): java.nio.file.Path = {
    hookInstalled
    val d = java.nio.file.Files.createTempDirectory(prefix)
    roots.add(d)
    d
  }
}
