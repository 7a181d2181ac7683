package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** w14's conservation contract: per attributed user the position model
  * hands out exactly 10000 bp and the decay model exactly the user's
  * purchase cents — integer arithmetic only, so the totals must match an
  * independent recount from the raw events table to the last unit. */
class MultiTouchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("w14 credits conserve exactly: 10000 bp and all cents per attributed user") {
    import spark.implicits._
    val out = SparkEntry.queries("w14_multitouch_attribution")(spark, sf).collect()
    val ev = Tables(spark, sf).events
    val touched = ev.filter($"event_type".isin("view", "click"))
      .select($"user_id").distinct()
    val attributed = ev.filter($"event_type" === "purchase")
      .join(touched, Seq("user_id"), "left_semi")
    val nUsers = attributed.select($"user_id").distinct().count()
    val cents = attributed
      .agg(sum(expr("cast(round(value * 100) as bigint)"))).head().getLong(0)
    assert(out.map(_.getAs[Long]("pos_credit_bp")).sum == 10000L * nUsers,
      "position-based bp do not sum to 10000 per user")
    assert(out.map(_.getAs[Long]("decay_credit_cents")).sum == cents,
      "decay credits do not sum to the attributed purchase cents")
    // both touch types must appear or the split test is vacuous
    assert(out.map(_.getString(0)).toSet == Set("click", "view"))
  }

  test("w18: removal effects are non-negative, credits close, channels complete") {
    val rows = SparkEntry.queries("w18_markov_attribution")(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet ==
      Set("click", "error", "signup", "view"))
    val base = rows.map(_.getAs[Long]("base_ppm")).distinct
    assert(base.length == 1, "base conversion must be scenario-independent")
    assert(base.head > 0 && base.head <= 1000000L)
    rows.foreach { r =>
      // removing a channel can only dead-end walks: removed <= base,
      // effect = base - removed >= 0 (monotonicity of the recursion)
      assert(r.getAs[Long]("removed_ppm") <= r.getAs[Long]("base_ppm"))
      assert(r.getAs[Long]("effect_ppm") ==
        r.getAs[Long]("base_ppm") - r.getAs[Long]("removed_ppm"))
      assert(r.getAs[Long]("effect_ppm") >= 0)
    }
    // truncated credit shares close to within one bp per channel
    val credits = rows.map(_.getAs[Long]("credit_bp")).sum
    assert(credits <= 10000 && credits >= 10000 - rows.length,
      s"credits do not close: $credits")
    // every channel must matter on the fixture (dead channels would make
    // the removal machinery untested)
    assert(rows.forall(_.getAs[Long]("effect_ppm") > 0))
  }

  test("c16: every headline equals its standalone leg's recomputation") {
    val rep = SparkEntry.queries("c16_growth_report")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val w16 = SparkEntry.queries("w16_conversion_lag")(spark, sf).collect()
    val d7 = w16.filter(_.getAs[Long]("latency_days") <= 7)
      .map(_.getAs[Long]("cum_bp")).maxOption.getOrElse(0L)
    assert(rep(("conversion", "d7_cum_bp")) == d7)
    val w17 = SparkEntry.queries("w17_survival_hazard")(spark, sf).collect()
    val peak = w17.maxBy(r =>
      (r.getAs[Long]("hazard_bp"), -r.getAs[Long]("duration_days")))
    assert(rep(("hazard", "peak_day")) == peak.getAs[Long]("duration_days"))
    assert(rep(("hazard", "peak_bp")) == peak.getAs[Long]("hazard_bp"))
    val topAsc = SparkEntry.queries("w18_markov_attribution")(spark, sf)
      .collect()
      .sortBy(r => (-r.getAs[Long]("credit_bp"), r.getString(0))).head
    assert(rep(("attribution", topAsc.getString(0))) ==
      topAsc.getAs[Long]("credit_bp"))
    val w19 = SparkEntry.queries("w19_cohort_ltv")(spark, sf).collect()
    val c0 = w19.map(_.getAs[Long]("cohort_ym")).min
    val mature = w19.filter(_.getAs[Long]("cohort_ym") == c0)
      .maxBy(_.getAs[Long]("age"))
    assert(rep(("ltv", "first_cohort_final_cents")) ==
      mature.getAs[Long]("ltv_cents"))
    assert(rep.size == 5)
  }
}
