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

  test("stores are isolated per run id") {
    val a = s"a_${System.nanoTime()}"; val b = s"b_${System.nanoTime()}"
    UpsertStore.applyBatch(a, 0, Iterator(1L -> 1L))
    UpsertStore.applyBatch(b, 0, Iterator(1L -> 2L))
    assert(UpsertStore.snapshot(a).toMap == Map(1L -> 1L))
    assert(UpsertStore.snapshot(b).toMap == Map(1L -> 2L))
    UpsertStore.drop(a); UpsertStore.drop(b)
  }
}
