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

  /** Stage-once memo: the first caller for `key` runs `write` into a fresh
    * scratch path and every caller gets that path back — the shared
    * pattern behind the staged media fixture, v9's persisted graph, and
    * any future deterministic fixture. `write` must fully materialize the
    * data before returning (computeIfAbsent holds the slot, so concurrent
    * callers block rather than observe a half-written dir). */
  private val stagedPaths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val stagedLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  def staged(key: String, prefix: String)(write: String => Unit): String = {
    val hit = stagedPaths.get(key)
    if (hit != null) return hit
    // per-key monitor instead of computeIfAbsent: `write` bodies NEST
    // staged calls (a drained stream stages its ingest dir first), and
    // ConcurrentHashMap throws "Recursive update" on any map mutation from
    // inside a compute — distinct keys lock independently here, and a
    // same-key re-entry is impossible (the inner call would have to be the
    // memo computing itself)
    val lock = stagedLocks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = stagedPaths.get(key)
      if (again != null) return again
      // retry once into a FRESH path: a transient first-write failure (FS
      // hiccup mid-bench) otherwise leaves the memo empty and every later
      // caller re-pays the full staging cost inside its own timing window
      val p = dir(prefix).resolve("data").toString
      val done =
        try { write(p); p }
        catch {
          case scala.util.control.NonFatal(e1) =>
            // drop the half-written first dir now (not at JVM shutdown), and
            // if the retry also fails keep the ORIGINAL failure visible
            try deleteRecursively(Path.of(p).getParent)
            catch { case scala.util.control.NonFatal(_) => () }
            val p2 = dir(prefix).resolve("data").toString
            try { write(p2); p2 }
            catch {
              case scala.util.control.NonFatal(e2) =>
                e2.addSuppressed(e1)
                throw e2
            }
        }
      stagedPaths.put(key, done)
      done
    }
  }

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
