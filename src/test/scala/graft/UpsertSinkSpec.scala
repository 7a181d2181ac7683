package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.TableUpsertStore

/** Pins the properties the e16 foreachBatch sink depends on, against the
  * TABLE-BACKED store (u6 FULL OUTER merge over versioned parquet): upsert
  * across batches, and idempotence under replayed batches (foreachBatch is
  * at-least-once — a retried batch must not change committed state). */
class UpsertSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def newStore() =
    new TableUpsertStore(Scratch.dir("upsert_spec").toString)

  private def snap(st: TableUpsertStore): Map[Long, Long] =
    st.snapshot(spark).collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("later batches overwrite; replayed batches are no-ops") {
    val st = newStore()
    st.applyBatch(Seq(1L -> 5L, 2L -> 1L).toDF("k", "v"), 0)
    st.applyBatch(Seq(1L -> 8L).toDF("k", "v"), 1)
    // at-least-once retry of batch 0 — must not regress key 1 or re-add 2
    st.applyBatch(Seq(1L -> 5L, 2L -> 1L).toDF("k", "v"), 0)
    assert(snap(st) == Map(1L -> 8L, 2L -> 1L))
    // keys written by both surviving batches are visible to batchIds
    assert(st.batchIds(spark) == Set(0L, 1L))
  }

  test("replay of the LATEST batch re-merges identical state (post-crash rerun)") {
    val st = newStore()
    st.applyBatch(Seq(1L -> 5L, 2L -> 1L).toDF("k", "v"), 0)
    st.applyBatch(Seq(1L -> 8L, 3L -> 4L).toDF("k", "v"), 1)
    val before = snap(st)
    // crash between version rename and checkpoint commit → batch 1 reruns
    st.applyBatch(Seq(1L -> 8L, 3L -> 4L).toDF("k", "v"), 1)
    assert(snap(st) == before)
  }

  test("e16 run really spans multiple micro-batches; totals survive upserts") {
    val (snap, batchIds) = graft.catalog.Streams.runUpsert(spark, TestSpark.sf)
    // one file per trigger over 4 staged splits → batch ids are sequential
    // from 0, so a surviving id ≥ 1 proves a multi-batch run. (Most users
    // appear in EVERY batch, so typically only the last batch's writes
    // survive — that is the upsert working, not a single-batch run.)
    assert(batchIds.nonEmpty && batchIds.max >= 1, s"single-batch run: $batchIds")
    val expect = Tables(spark, TestSpark.sf).events
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(snap.toMap == expect)
  }

  test("stores are isolated per root dir") {
    val a = newStore(); val b = newStore()
    a.applyBatch(Seq(1L -> 1L).toDF("k", "v"), 0)
    b.applyBatch(Seq(1L -> 2L).toDF("k", "v"), 0)
    assert(snap(a) == Map(1L -> 1L))
    assert(snap(b) == Map(1L -> 2L))
  }
}
