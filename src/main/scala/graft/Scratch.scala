package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch root for the staging / checkpoint / output / lifecycle-
  * index directories that declared queries create (streaming replays,
  * q_stream_upsert's build-and-maintain index). Every dir lives under ONE
  * `graft-scratch-*` root that a JVM-exit hook removes, so repeated
  * bench/verify sweeps no longer accumulate full-corpus copies in /tmp.
  *
  * Deletion is at JVM exit, not query completion, deliberately: a declared
  * query RETURNS a lazy DataFrame whose backing files are re-read whenever
  * the driver consumes it (Verify writes it out, Bench counts it) — eager
  * cleanup would race the consumer. One JVM = one sweep in the driver
  * protocol (sbt runMain forks per invocation), so exit-time cleanup is
  * exactly per-sweep cleanup.
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft-scratch-")
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try graft.sources.Maintenance.deleteRecursively(r)
      catch { case _: Throwable => () })) // exit path: never block shutdown
    r
  }

  /** A fresh directory under the per-JVM root (same contract as
    * `Files.createTempDirectory(prefix)` — unique, exists, absolute). */
  def dir(prefix: String): String =
    Files.createTempDirectory(root, prefix).toString
}
