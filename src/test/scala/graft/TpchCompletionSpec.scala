package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral pins for the round-9 TPC-H completion batch (q23–q32) beyond
  * the DuckDB hash-match: the argmin/threshold/conservation properties each
  * shape exists for, re-derived independently on the sf0.001 tables. */
class TpchCompletionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("q23: the one-aggregate argmin equals a brute per-part scan") {
    val out = SparkEntry.queries("q23_min_cost_supplier")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // brute recompute: min (cost, suppkey) pair per qualifying part over
    // the EUROPE-filtered supply rows
    val t = Tables(spark, sf)
    val sup = t.supplier
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .join(t.region, col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE").select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    val parts = t.part
      .filter(col("p_type") === "STANDARD" && col("p_size") <= 5)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val brute = t.lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(x => parts(x._1) && sup(x._2))
      .groupBy(x => (x._1, x._2))
      .map { case ((p, s), xs) => (p, xs.map(_._3).min, s) }
      .groupBy(_._1)
      .map { case (p, xs) => p -> { val m = xs.minBy(x => (x._2, x._3)); (m._2, m._3) } }
    assert(out == brute, "argmin diverged from the brute per-part minimum")
    assert(out.nonEmpty)
  }

  test("q26: share is bounded bp and yearly totals re-add to the direct recount") {
    val rows = SparkEntry.queries("q26_market_share")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "nation slice exceeds the total")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 10000)
      assert(r.getLong(3) == r.getLong(2) * 10000 / r.getLong(1))
    }
    assert(rows.nonEmpty)
  }

  test("q31: the left-join histogram conserves every customer exactly once") {
    val rows = SparkEntry.queries("q31_cust_order_dist")(spark, sf).collect()
    val nCust = Tables(spark, sf).customer.count()
    assert(rows.map(_.getLong(1)).sum == nCust,
      "histogram buckets must partition the customer dim (incl. the zero bucket)")
    // buckets are distinct counts — keys unique
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length)
  }

  test("q32: every emitted order beats the quantity threshold; top-20 is the true prefix") {
    val rows = SparkEntry.queries("q32_large_orders")(spark, sf).collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(4) > 250))
    // the emitted minimum total must dominate every non-emitted qualifier
    val t = Tables(spark, sf)
    val qual = t.lineitem.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(round(l_quantity) as bigint)")).as("sq"))
      .filter(col("sq") > 250)
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("tc"),
              col("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    if (qual.length > 20) {
      val emitted = rows.map(r => (r.getLong(3), r.getLong(2))).toSet
      val topTrue = qual.sortBy { case (tc, ok) => (-tc, ok) }.take(20).toSet
      assert(emitted == topTrue, "limit(20) is not the true ordered prefix")
    }
  }

  test("q24: decimal revenue equals a BigDecimal serial recompute") {
    val out = SparkEntry.queries("q24_forecast_revenue")(spark, sf).head()
    val rows = Tables(spark, sf).lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .select("l_extendedprice", "l_discount").collect()
    val exact = rows.map { r =>
      BigDecimal(r.getDouble(0)).setScale(2, BigDecimal.RoundingMode.HALF_UP) *
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(out.getLong(1) == rows.length.toLong)
    assert(out.getDouble(0) == exact.setScale(4).toDouble,
      "parallel decimal sum must equal the serial BigDecimal fold")
  }
}
