package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape guardrails over the whole driver contract.
  *
  * The round-1 verdict flagged unpartitioned `Window.orderBy` (whole table
  * into one partition) as a scale-killer; round 2 replaced them with
  * bucketed two-pass ScaleOps. This audit keeps them out for good: the only
  * allowed empty-partition windows are ScaleOps' bucket-summary windows,
  * which run over nBuckets rows (one per shuffle partition), not data.
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** real micro-batch executions — audited by their own specs, and running
    * them here would start streams */
  private def isStreaming(name: String) =
    Seq("e6_", "e7_", "e8_", "e9_").exists(name.startsWith)

  /** ScaleOps bucket-summary windows (≤ one row per shuffle partition). */
  /** g10's window runs over per-FILE summaries (≤ 8 rows), not data. */
  /** r9's carry window orders YEAR-total rows (~7) — the cross-bucket pass
    * of the two-pass prefix sum, metadata-scale by construction. */
  /** dq10's trailing-28-day window runs over the DAILY rollup (~365 rows
    * per year of calendar whatever the corpus size), after the data-scale
    * date-keyed aggregate. */
  /** g17's single-group orderStats: the constant group key folds away,
    * leaving ScaleOps' bucket-summary cumsum (≤ nBuckets = 4096 rows, one
    * per value bucket — not data-scale) unpartitioned in the plan. */
  /** g18/c5's bucket-offset window cumulates the 32-row per-bucket sum
    * frame (g4's two-pass shape without g4's lang partition key) — one row
    * per doc_id range slice, never data. */
  private val allowedUnpartitioned = Map(
    "e5_late_data" -> 1, "w5_ntile" -> 1, "g10_range_layout" -> 1,
    "r9_interval_sweep" -> 1, "dq10_rolling_anomaly" -> 1,
    "g17_hilbert_layout" -> 1, "g18_sequence_packing" -> 1,
    "c5_pretrain_pack" -> 1,
    // g19's class→window offset cumsum runs over the ≤513-row class frame
    // (one row per harmonic length class), never documents. c7 composes
    // the same binPack stage, so it inherits the same class-frame window.
    "g19_boundary_pack" -> 1, "c7_release_gate" -> 1,
    // w16's cumulative runs over the latency-day HISTOGRAM (≤ corpus span
    // in days — dq10's calendar-bounded class), after the user-keyed
    // data-scale aggregates.
    "w16_conversion_lag" -> 1,
    // w17's risk-set running sum runs over the same duration-day histogram
    // as w16 (≤ corpus span in days), after the user-keyed aggregates.
    "w17_survival_hazard" -> 1,
    // g22's dominance running max runs over the per-n_chars maxima frame
    // (≤ distinct doc lengths ≈ hundreds, a bounded value domain), after
    // the data-scale per-length aggregate.
    "g22_pareto_frontier" -> 1,
    // c13 composes dq10 as shipped; dq10's one calendar-bounded window
    // appears TWICE in the logical plan because the verdict leg
    // re-references the unioned flag subtree (same window, two plan
    // occurrences — physical exchange reuse collapses them).
    "c13_ops_health" -> 2,
    // g26 composes binPack at three window sizes — three occurrences of
    // g19's allowlisted class-frame cumsum (≤ |length classes| rows per
    // sweep point, never documents).
    "g26_window_sweep" -> 3,
    // x28's cumulative runs over the 10-row slice frame (bucket domain),
    // after the data-scale token aggregates.
    "x28_vocab_growth" -> 1,
    // e32's cumulative runs over the latency-day histogram (w16's
    // allowlisted class), off the final stream-state table.
    "e32_stream_conversion_lag" -> 1,
    // c16 composes w16 + w17 as shipped — both calendar-bounded
    // histogram windows appear (w17's contributes twice: the peak
    // argmax re-references the risk-set subtree, c13's plan-occurrence
    // situation; physical exchange reuse collapses them).
    "c16_growth_report" -> 3)

  test("no data-scale unpartitioned Window in any query plan") {
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!isStreaming(name)) {
        val plan = fn(spark, sf).queryExecution.optimizedPlan
        val bad = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        val allowed = allowedUnpartitioned.getOrElse(name, 0)
        assert(bad.size <= allowed,
          s"$name has ${bad.size} unpartitioned Window(s), allowed $allowed")
      }
    }
  }

  test("every oracle key has a query; bench short keys stay unique") {
    val q = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet -- q
    assert(missing.isEmpty, s"oracle without query: $missing")
    val shortKeys = q.toSeq.map(_.takeWhile(_ != '_'))
    assert(shortKeys.distinct.size == shortKeys.size,
      "bench short keys collide: " +
        shortKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k })
  }
}
