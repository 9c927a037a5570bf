package graft.sources

import java.nio.file.{Files, Path, StandardOpenOption}

/** CROSS-PROCESS single-writer exclusion for index maintenance — the
  * lock-file lease every LSM-ish store ships (Lucene's write.lock /
  * NativeFSLockFactory discipline; reference: a single-process service
  * whose in-process mutex is its whole story — a Spark deployment can
  * run maintenance from many drivers, so the exclusion must live in the
  * shared filesystem, not a JVM).
  *
  * Semantics:
  *  - every maintenance ENTRY POINT (upsert, delete, vacuum, compact,
  *    rebuild — the CDC sinks call these, so they are covered
  *    transitively) wraps itself in [[withLease]] on the INDEX ROOT
  *    (the directory holding data/, dict/, keymap/, ...)
  *  - acquisition is an atomic CREATE_NEW of `_writer.lock` under the
  *    root: exactly one creator wins on any POSIX filesystem
  *  - a SECOND concurrent maintainer is REFUSED fail-fast with an
  *    actionable message (never queued: maintenance ops are minutes-
  *    scale — a silent queue would hide the operational error of two
  *    maintainers pointed at one index)
  *  - same-THREAD nesting re-enters freely (a lifecycle op composed of
  *    entry points must not self-deadlock)
  *  - a lease whose file hasn't been touched for [[StaleMs]] is a CRASH
  *    remnant (the holder would have finished or refreshed) and is
  *    taken over — the same self-heal-by-age discipline the marker/
  *    stamp machinery uses, so a killed maintainer never bricks the
  *    index
  *
  * READS never take the lease: the read path's crash-consistency story
  * is the stamp/snapshot discipline, unchanged.
  *
  * Scope note: within one JVM the ReentrantLock below makes the refusal
  * deterministic (no window where two local threads both hold the file);
  * across JVMs the CREATE_NEW atomicity is the guarantee. The known
  * residual window — a maintainer PAUSED longer than [[StaleMs]] (GC,
  * SIGSTOP) whose lease is taken over and then resumes — is the
  * documented limit of every mtime-lease scheme (Lucene's included);
  * the stamp-guarded readers still never serve a torn view, and the
  * half-applied write is exactly what the audit/repair family exists
  * to flag and heal. */
object WriterLease {

  /** Age past which a lease is presumed crashed and taken over. */
  private[sources] val StaleMs: Long = 10 * 60 * 1000L

  private val jvmLocks =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.locks.ReentrantLock]()

  /** Run `body` holding the index root's writer lease. Fail-fast
    * `IllegalStateException` if another maintainer (thread or process)
    * holds it; re-entrant for the same thread. */
  def withLease[T](root: Path)(body: => T): T = {
    val l = jvmLocks.computeIfAbsent(root.toString,
      _ => new java.util.concurrent.locks.ReentrantLock())
    if (!l.tryLock())
      throw new IllegalStateException(refusal(root, "this process"))
    try {
      val reentrant = l.getHoldCount > 1
      if (!reentrant) acquireFile(root)
      try body
      finally if (!reentrant) Files.deleteIfExists(lockFileOf(root))
    } finally l.unlock()
  }

  private[sources] def lockFileOf(root: Path): Path =
    root.resolve("_writer.lock")

  private def refusal(root: Path, holder: String): String =
    s"another maintainer ($holder) holds the writer lease at " +
      s"${lockFileOf(root)} — concurrent maintenance on one index is " +
      "refused. Wait for the other maintainer to finish; a lease from a " +
      s"crashed process self-heals after ${StaleMs / 1000}s, or delete " +
      "the lock file if you are certain the holder is dead."

  private def acquireFile(root: Path): Unit = {
    Files.createDirectories(root)
    val f = lockFileOf(root)
    var tookOver = false
    while (true) {
      try {
        Files.write(f,
          s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}"
            .getBytes(java.nio.charset.StandardCharsets.UTF_8),
          StandardOpenOption.CREATE_NEW)
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val age =
            try System.currentTimeMillis() -
              Files.getLastModifiedTime(f).toMillis
            catch { case _: java.io.IOException => 0L } // raced a release: retry
          if (age == 0L && !Files.exists(f)) {
            // the holder released between our create and our stat — retry
          } else if (age > StaleMs && !tookOver) {
            // crash-stale: delete and retry ONCE (a second loser here
            // means a live contender took it first — refuse)
            Files.deleteIfExists(f)
            tookOver = true
          } else {
            val held =
              try new String(Files.readAllBytes(f),
                java.nio.charset.StandardCharsets.UTF_8)
              catch { case _: java.io.IOException => "unknown" }
            throw new IllegalStateException(refusal(root, held))
          }
      }
    }
  }
}
