package graft

import org.scalatest.funsuite.AnyFunSuite

/** Runtime row-level filtering (bloom-filter join pruning) — the 100 TB
  * lever that keeps a selective dim filter from scanning the whole fact
  * side: Spark injects a bloom filter built from the filtered creation
  * side into the application side's scan. The thresholds default to
  * cluster-scale sizes (10 GB application side), so this spec lowers them
  * to prove the MECHANISM fires and preserves results — the configuration
  * a production job sets is documented here, not in query code, because
  * injection is an optimizer concern, not a per-query one. */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom might_contain on the fact scan") {
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins don't need the bloom filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = Tables(spark, TestSpark.sf)
      val dim = t.orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey", $"o_orderdate")
      val q = t.lineitem.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderdate")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // and the filter must not change the result
      val expect = t.lineitem.join(
          t.orders.filter($"o_orderpriority" === "1-URGENT")
            .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey")
        .count()
      assert(q.agg(org.apache.spark.sql.functions.sum($"n")).head.getLong(0) == expect)
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
