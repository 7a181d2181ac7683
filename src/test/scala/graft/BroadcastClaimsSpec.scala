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
}
