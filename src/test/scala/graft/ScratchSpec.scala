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

  test("a same-thread staging cycle fails fast instead of recursing") {
    // round-11 advice: per-key monitors are reentrant, so a cyclic nesting
    // (outer stages k, k's write stages outer) would re-enter the outer
    // synchronized block and run the outer write AGAIN — unbounded
    // recursion where computeIfAbsent used to throw. The thread-local
    // in-flight set turns it into an immediate, named error.
    val kA = s"spec_cycle_a_${System.nanoTime()}"
    val kB = s"spec_cycle_b_${System.nanoTime()}"
    val e = intercept[IllegalStateException] {
      Scratch.staged(kA, "scratchspec") { _ =>
        Scratch.staged(kB, "scratchspec") { _ =>
          Scratch.staged(kA, "scratchspec") { _ => () }
        }
      }
    }
    assert(e.getMessage.contains(kA) && e.getMessage.contains("cycle"))
    // the failed cycle does not poison either key
    val ok = Scratch.staged(kA, "scratchspec") { p =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
    }
    assert(ok.nonEmpty)
  }

  test("soak: 8 threads × mixed first/late access over 3 keys — one write per key, no deadlock") {
    // round-11 verdict item 6: drain staging + per-key monitors back most
    // of the bench; pin them under real contention. Each key's write is
    // slow (forces overlap) and NESTS a shared upstream key — the exact
    // drains/media/graph shape — from threads hitting the keys in
    // different orders.
    val tag = System.nanoTime()
    val writes = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    def stage(key: String): String =
      Scratch.staged(key, "scratchsoak") { p =>
        writes.computeIfAbsent(key, _ => new AtomicInteger).incrementAndGet()
        // nested upstream dependency shared by every key
        Scratch.staged(s"soak_upstream_$tag", "scratchsoak") { q =>
          writes.computeIfAbsent("up", _ => new AtomicInteger).incrementAndGet()
          Thread.sleep(30)
          java.nio.file.Files.createDirectories(java.nio.file.Paths.get(q))
        }
        Thread.sleep(50)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
      }
    val keys = (1 to 3).map(i => s"soak_k${i}_$tag")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futs = (0 until 8).flatMap { t =>
        // rotate the key order per thread so lock acquisition orders cross
        val order = keys.drop(t % 3) ++ keys.take(t % 3)
        order.map(k => pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = stage(k)
        }))
      }
      futs.foreach(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // every caller of a given key observes the SAME memoized path
      keys.foreach { k =>
        val paths = (0 until 8).map(_ => stage(k)).distinct
        assert(paths.size == 1, s"$k returned ${paths.size} distinct paths")
      }
      assert(keys.forall(k => writes.get(k).get() == 1),
        s"some key staged more than once: ${writes}")
      assert(writes.get("up").get() == 1, s"upstream staged ${writes.get("up")}×")
    } finally pool.shutdownNow()
  }

  test("parquet memoizes the resolved relation per (session, path-set), not the rows") {
    // round-14 optimization: manifest-reading queries (k19 builds 21
    // relations PER REP) re-listed staged dirs and re-read footers on the
    // driver every rep. The memo must return plan state (same DataFrame
    // instance for the same path set), key distinct path sets apart, and
    // keep reading rows from disk — it is a listing cache, never a result
    // cache.
    val spark = TestSpark.spark
    import spark.implicits._
    val d1 = Scratch.dir("pqmemo").resolve("a").toString
    val d2 = Scratch.dir("pqmemo").resolve("b").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "s").write.parquet(d1)
    Seq((3L, "z")).toDF("id", "s").write.parquet(d2)
    val r1 = Scratch.parquet(spark, d1)
    assert(Scratch.parquet(spark, d1) eq r1, "same path set must memo-hit")
    assert(!(Scratch.parquet(spark, d2) eq r1), "distinct paths must not share")
    assert(!(Scratch.parquet(spark, d1, d2) eq r1), "multi-path set is its own key")
    assert(r1.orderBy($"id").collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(Scratch.parquet(spark, d1, d2).count() == 3)
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
