package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan guardrails for documented broadcast claims: these queries' scale
  * stories depend on the SMALL side broadcasting so the corpus-sized side
  * never shuffles for the join — a silent regression to a shuffle join
  * would keep results green while killing the 100 TB plan. */
class BroadcastClaimsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, TestSpark.sf).queryExecution.executedPlan.toString

  test("x9: the eval shingle set broadcasts; the corpus scan never shuffles for the join") {
    assert(plan("x9_decontam").contains("BroadcastHashJoin"))
  }

  test("v1: the query set broadcasts against the single corpus scan") {
    val p = plan("v1_brute_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"v1 must broadcast the query side:\n$p")
  }

  test("w9: share-of-total is a broadcast ratio, not a global window") {
    val p = plan("w9_share_of_total")
    assert(p.contains("Broadcast"), s"w9 must broadcast the total:\n$p")
    assert(!p.contains("Window"), s"w9 must not use a window:\n$p")
  }

  test("g6: per-lang rates broadcast; the corpus never shuffles for the join") {
    assert(plan("g6_mixture_sample").contains("BroadcastHashJoin"))
  }

  test("g5/c2: bucket offsets broadcast back (two-pass shape, no wide sort)") {
    assert(plan("g5_shuffle_shard").contains("BroadcastHashJoin"))
    assert(plan("c2_export_shards").contains("BroadcastHashJoin"))
  }

  test("x22: the eval embedding set broadcasts; the corpus never shuffles to score") {
    assert(plan("x22_semantic_decontam").contains("BroadcastHashJoin"))
  }

  test("x12: the rarity threshold is a broadcast scalar") {
    val p = plan("x12_rare_token_filter")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"x12 must broadcast the threshold:\n$p")
  }

  test("v20: the probe set broadcasts; the predicate reaches the documents scan") {
    val p = plan("v20_filtered_ann")
    assert(p.contains("BroadcastHashJoin"), s"v20 must broadcast probes:\n$p")
    assert(p.contains("lang"), s"v20's predicate must appear in the plan:\n$p")
    // the predicate is pushed into the parquet scan, not applied post-read
    assert(p.contains("PushedFilters") && p.replaceAll("\\s", "")
      .matches("(?s).*PushedFilters:\\[[^\\]]*EqualTo\\(lang,en\\).*"),
      s"v20's lang predicate must push to the documents scan:\n$p")
  }

  test("x23: inference is a literal projection — no join, no window after training") {
    // the classify stage runs over the held-out scan with the model inlined
    // as literals: the plan may contain the train-side aggregate but the
    // prediction path must not introduce a Window
    val p = plan("x23_centroid_classifier")
    assert(!p.contains("Window"), s"x23 inference must not use a window:\n$p")
  }

  test("q23/q25/q28: TPC-H completion joins broadcast their dims, BNLJ-free") {
    // q23: region-filtered supplier dim and the part slice broadcast onto
    // the supply aggregate; q25: both nation-reduced sides broadcast onto
    // the facts; q28: the customer enrichment broadcasts onto the
    // aggregated per-customer frame. None may degrade to a
    // BroadcastNestedLoopJoin (no join keys lost) at any scale.
    Seq("q23_min_cost_supplier", "q25_volume_shipping",
        "q28_returned_items").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q must broadcast dims:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q degraded to BNLJ:\n$p")
    }
    // q24/q30: the date windows must prune at the lineitem scan
    Seq("q24_forecast_revenue", "q30_shipmode_priority").foreach { q =>
      val raw = plan(q)
      assert(raw.replaceAll("\\s", "")
          .matches("(?s).*PushedFilters:\\[[^\\]]*l_shipdate.*"),
        s"$q's shipdate range must push to the lineitem scan:\n$raw")
    }
  }

  test("q14/q20: the selective filters reach the parquet scans") {
    // q14's month range must prune lineitem at the scan; q20's name
    // prefix must prune part at the scan — at 100 TB these predicates
    // ARE the plan (row-group skipping via min/max stats)
    val raw14 = plan("q14_promo_share")
    assert(raw14.replaceAll("\\s", "")
        .matches("(?s).*PushedFilters:\\[[^\\]]*l_shipdate.*"),
      s"q14's shipdate range must push to the lineitem scan:\n$raw14")
    val raw20 = plan("q20_nested_semi")
    assert(raw20.replaceAll("\\s", "")
        .matches("(?s).*PushedFilters:\\[[^\\]]*StringStartsWith\\(p_name,small\\).*"),
      s"q20's name prefix must push to the part scan:\n$raw20")
  }

  test("q19: equi-key extracted from the disjunction — hash join, never NLJ") {
    // the classic Q19 trap: a planner that fails to factor out
    // l_partkey = p_partkey from the OR-of-ANDs falls back to a
    // nested-loop join over lineitem × part
    val p = plan("q19_disjunctive_join")
    assert(p.contains("BroadcastHashJoin"), s"q19 must hash-join on partkey:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"q19 must not degrade to a nested-loop join:\n$p")
  }

  test("q20/q22: semi/anti probes keep the dim side unshuffled") {
    // q20's supplier semi-join probes the tiny qualifying set; q22's
    // global-mean scalar is a broadcast 1-row cross join
    assert(plan("q20_nested_semi").contains("LeftSemi"),
      "q20 must plan a semi join")
    val p22 = plan("q22_idle_customers")
    assert(p22.contains("LeftAnti"), s"q22 must plan an anti join:\n$p22")
    // the 1-row scalar-mean cross join specifically — a broadcast
    // elsewhere in the plan must not satisfy this pin
    assert(p22.contains("BroadcastNestedLoopJoin"),
      s"q22's scalar mean must be a broadcast 1-row cross join:\n$p22")
  }

  test("u14: every delta-rule term broadcasts its delta side; the base never shuffles") {
    val p = plan("u14_join_view_delta")
    assert(p.contains("BroadcastHashJoin"),
      s"u14's delta joins must broadcast:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"u14 must not degrade to a nested-loop join:\n$p")
  }

  test("j12: the exploded center neighborhoods broadcast; points never shuffle") {
    val p = plan("j12_spatial_join")
    assert(p.contains("BroadcastHashJoin"),
      s"j12's cell probe must broadcast the K*9 center rows:\n$p")
  }

  test("d21/g22: blocked linkage and skyline stay hash/broadcast, never NLJ") {
    val pd = plan("d21_fuzzy_join")
    assert(!pd.contains("BroadcastNestedLoopJoin"),
      s"d21's shingle blocking must stay a hash join:\n$pd")
    val pg = plan("g22_pareto_frontier")
    assert(pg.contains("BroadcastHashJoin"),
      s"g22's frontier must broadcast back to the corpus:\n$pg")
  }
}
