package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.UpsertStore

/** Pins the two properties the e16 foreachBatch sink depends on: upsert
  * across batches, and idempotence under replayed batches (foreachBatch is
  * at-least-once — a retried batch must not double-apply). */
class UpsertSinkSpec extends AnyFunSuite {

  test("later batches overwrite; replayed batches are no-ops") {
    val run = s"spec_${System.nanoTime()}"
    UpsertStore.applyBatch(run, 0, Iterator(1L -> 5L, 2L -> 1L))
    UpsertStore.applyBatch(run, 1, Iterator(1L -> 8L))
    // at-least-once retry of batch 0 — must not regress key 1 or re-add 2
    UpsertStore.applyBatch(run, 0, Iterator(1L -> 5L, 2L -> 1L))
    assert(UpsertStore.snapshot(run).toMap == Map(1L -> 8L, 2L -> 1L))
    UpsertStore.drop(run)
  }

  test("e16 run really spans multiple micro-batches; totals survive upserts") {
    val spark = TestSpark.spark
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

  test("stores are isolated per run id") {
    val a = s"a_${System.nanoTime()}"; val b = s"b_${System.nanoTime()}"
    UpsertStore.applyBatch(a, 0, Iterator(1L -> 1L))
    UpsertStore.applyBatch(b, 0, Iterator(1L -> 2L))
    assert(UpsertStore.snapshot(a).toMap == Map(1L -> 1L))
    assert(UpsertStore.snapshot(b).toMap == Map(1L -> 2L))
    UpsertStore.drop(a); UpsertStore.drop(b)
  }
}
