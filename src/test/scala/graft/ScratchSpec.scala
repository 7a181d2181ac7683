package graft

import java.util.concurrent.atomic.AtomicInteger
import org.scalatest.funsuite.AnyFunSuite

/** Pins the stage-once memo the bench-visible fixtures depend on: one write
  * per key, and a transiently-failing first write retries into a FRESH path
  * instead of leaving the memo empty (the round-6 m10 bench transient —
  * every later caller re-paid staging inside its timing window). */
class ScratchSpec extends AnyFunSuite {

  test("staged runs the write exactly once per key and memoizes the path") {
    val writes = new AtomicInteger(0)
    val key = s"spec_once_${System.nanoTime()}"
    val p1 = Scratch.staged(key, "scratchspec") { p =>
      writes.incrementAndGet()
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    }
    val p2 = Scratch.staged(key, "scratchspec") { _ => writes.incrementAndGet() }
    assert(p1 == p2)
    assert(writes.get() == 1)
  }

  test("a write that throws once is retried into a fresh path, then memoized") {
    val attempts = new AtomicInteger(0)
    val paths = scala.collection.mutable.ListBuffer[String]()
    val key = s"spec_retry_${System.nanoTime()}"
    val got = Scratch.staged(key, "scratchspec") { p =>
      paths += p
      if (attempts.incrementAndGet() == 1) sys.error("transient staging failure")
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    }
    assert(attempts.get() == 2, "failed write was not retried")
    assert(paths.distinct.size == 2, "retry reused the possibly-half-written path")
    assert(got == paths.last)
    // later callers get the memoized survivor without re-running the write
    val again = Scratch.staged(key, "scratchspec") { _ => attempts.incrementAndGet() }
    assert(again == got && attempts.get() == 2)
  }

  test("staged is reentrant: a staging body may stage its own dependency") {
    // the round-11 drain-staged regression: e28's drained output stages its
    // ingest dir INSIDE the drain's write body; computeIfAbsent-based
    // memoization threw "Recursive update" on exactly this shape
    val innerWrites = new AtomicInteger(0)
    val kOuter = s"spec_outer_${System.nanoTime()}"
    val kInner = s"spec_inner_${System.nanoTime()}"
    val outer = Scratch.staged(kOuter, "scratchspec") { p =>
      val dep = Scratch.staged(kInner, "scratchspec") { q =>
        innerWrites.incrementAndGet()
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(q))
      }
      assert(dep.nonEmpty)
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    }
    assert(outer.nonEmpty && innerWrites.get() == 1)
    // both memos hold independently afterwards
    val innerAgain = Scratch.staged(kInner, "scratchspec") { _ =>
      innerWrites.incrementAndGet()
    }
    assert(innerWrites.get() == 1 && innerAgain.nonEmpty)
  }

  test("a write that keeps failing propagates and leaves the memo empty") {
    val attempts = new AtomicInteger(0)
    val key = s"spec_fail_${System.nanoTime()}"
    intercept[RuntimeException] {
      Scratch.staged(key, "scratchspec") { _ =>
        attempts.incrementAndGet(); sys.error("persistent failure")
      }
    }
    assert(attempts.get() == 2)
    // the key is NOT poisoned: a later healthy caller stages successfully
    val ok = Scratch.staged(key, "scratchspec") { p =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    }
    assert(ok.nonEmpty)
  }
}
