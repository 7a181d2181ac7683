package graft.streaming

import scala.collection.concurrent.TrieMap

/** Keyed upsert store backing the e16 foreachBatch sink — the local
  * stand-in for the external MERGE target (a key-value store, a Delta/
  * Iceberg MERGE INTO, a JDBC upsert) that update-mode streaming
  * aggregations feed in production.
  *
  * Semantics pinned here and by UpsertSinkSpec:
  *  - UPSERT: later batches overwrite a key's value (update-mode streams
  *    re-emit a key whenever its aggregate changes);
  *  - IDEMPOTENT REPLAY: each write carries its micro-batch id, and a key
  *    ignores writes from a batch it has already applied — re-running a
  *    failed/retried batch (Spark's at-least-once foreachBatch contract)
  *    cannot double-apply, which is exactly how exactly-once sinks are
  *    built over foreachBatch.
  *
  * At 100 TB the `apply` body is a bulk MERGE keyed the same way; the
  * TrieMap is per-run (registry keyed by run id) so concurrent queries and
  * tests never share state.
  */
object UpsertStore {
  private val stores =
    new java.util.concurrent.ConcurrentHashMap[String, TrieMap[Long, (Long, Long)]]()

  def store(runId: String): TrieMap[Long, (Long, Long)] =
    stores.computeIfAbsent(runId, _ => TrieMap.empty)

  /** Apply one micro-batch's (key, value) rows under batch-id idempotence:
    * a key accepts a write iff it has not yet applied a batch ≥ batchId. */
  def applyBatch(runId: String, batchId: Long, rows: Iterator[(Long, Long)]): Unit = {
    val st = store(runId)
    rows.foreach { case (k, v) =>
      st.get(k) match {
        case Some((lastB, _)) if lastB >= batchId => () // replayed batch: no-op
        case _ => st.put(k, (batchId, v))
      }
    }
  }

  def snapshot(runId: String): Seq[(Long, Long)] =
    store(runId).iterator.map { case (k, (_, v)) => (k, v) }.toSeq

  /** Distinct micro-batch ids that wrote surviving values — lets specs
    * assert a run REALLY spanned multiple batches. */
  def batchIds(runId: String): Set[Long] =
    store(runId).iterator.map { case (_, (b, _)) => b }.toSet

  def drop(runId: String): Unit = stores.remove(runId)
}
