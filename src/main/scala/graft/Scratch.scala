package graft

import java.nio.file.{Files, Path}

/** Per-JVM scratch space for harness staging (ORC/Avro round-trips, stream
  * ingest dirs, the staged media fixture). One root temp directory, created
  * lazily, recursively deleted by a shutdown hook — repeated bench runs no
  * longer accumulate table copies in /tmp (round-4 advice). At 100 TB the
  * analog is a job-scoped staging prefix on the cluster store with a TTL
  * policy; nothing below leaks outside the JVM's lifetime either way.
  */
object Scratch {
  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(r)))
    r
  }

  /** A fresh empty subdirectory under the per-JVM root. */
  def dir(prefix: String): Path =
    Files.createTempDirectory(root, prefix)

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val ls = Files.list(p)
      try {
        val it = ls.iterator()
        while (it.hasNext) deleteRecursively(it.next())
      } finally ls.close()
    }
    try Files.deleteIfExists(p) catch { case _: java.io.IOException => () }
  }
}
