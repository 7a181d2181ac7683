package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** j10's explicit bloom semi-join reduction (the hand-built analog of the
  * planner-injected filter RuntimeFilterSpec covers): the sketch must
  * actually REDUCE the fact side before the shuffle, tolerate false
  * positives without changing results, and stay exactly equal to the plain
  * join it accelerates. */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("j10: bloom pre-filter keeps all matches, drops most non-matches") {
    import spark.implicits._
    val t = Tables(spark, sf)
    val dim = t.customer.filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val bf = dim.stat.bloomFilter("c_custkey", 200000L, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bfB.value.mightContainLong(k))

    val total = t.orders.count()
    val kept = t.orders.filter(mightContain($"o_custkey")).count()
    val exact = t.orders.join(dim, $"o_custkey" === $"c_custkey",
      "left_semi").count()
    // no false negatives: every true match survives the sketch
    assert(kept >= exact, s"bloom dropped matches: kept=$kept exact=$exact")
    // the reduction fires: the sketch passes at most exact + fpp-slack rows
    assert(kept < total, s"bloom filtered nothing (kept=$kept of $total)")
    assert(kept <= exact + math.max(50L, (0.05 * total).toLong),
      s"false-positive rate out of band: kept=$kept exact=$exact n=$total")
  }

  test("j10: result equals the plain join (false positives removed)") {
    val q = SparkEntry.queries("j10_bloom_join")(spark, sf).collect()
    import spark.implicits._
    val t = Tables(spark, sf)
    val plain = t.orders
      .join(t.customer.filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey"), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("decimal(38,2)")
          .cast("double").as("sum_price"))
      .orderBy($"o_orderpriority").collect()
    assert(q.toSeq == plain.toSeq)
  }
}
