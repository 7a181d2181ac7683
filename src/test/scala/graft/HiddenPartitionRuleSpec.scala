package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the hidden-partitioning optimizer rule (k36): the
  * derived conjuncts land in the optimized plan and reach the scan's
  * PartitionFilters, the fixed-point batch cannot double-inject them, the
  * rule no-ops on unregistered relations, and the month-cover derivation
  * handles the boundary cases. */
class HiddenPartitionRuleSpec extends AnyFunSuite {
  private lazy val spark = graft.TestSpark.spark
  private val sf = graft.TestSpark.sf

  private def store: String = {
    val root = graft.catalog.Formats.hiddenPartStore(spark, sf)
    HiddenPartitions.install(spark)
    HiddenPartitions.register(root, Seq(
      HiddenPartitions.MonthOf("o_orderdate", "p_month"),
      HiddenPartitions.BucketOf("o_custkey", "p_bucket", 8)))
    root
  }

  test("raw-column predicates derive partition filters that reach the scan") {
    import spark.implicits._
    val k = graft.catalog.Formats.hiddenPartPick(spark, sf)
    val df = spark.read.parquet(store)
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-06-01" &&
              $"o_custkey" === k)
      .agg(count(lit(1)))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("p_month") && opt.contains("p_bucket"),
      s"derived conjuncts missing from optimized plan:\n$opt")
    val phys = df.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*p_month[^\\]]*\\]".r
    assert(pf.findFirstIn(phys).isDefined,
      s"partition filters did not reach the scan:\n$phys")
  }

  test("fixed-point batch cannot double-inject (rule is idempotent)") {
    import spark.implicits._
    val df = spark.read.parquet(store)
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-06-01")
      .agg(count(lit(1)))
    val opt = df.queryExecution.optimizedPlan
    // one application of the rule on the already-optimized plan is a no-op
    assert(HiddenPartitions.Rule(opt).fastEquals(opt))
    // and the optimized plan carries the month-list conjunct exactly once
    val hits = "p_month#\\d+ IN ".r.findAllIn(opt.toString).length
    assert(hits == 1, s"expected one derived p_month IN conjunct, got $hits")
  }

  test("unregistered relations are untouched") {
    import spark.implicits._
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-06-01")
      .agg(count(lit(1)))
    assert(!df.queryExecution.optimizedPlan.toString.contains("p_month"))
  }

  test("registration through a symlink matches a read through the real path") {
    // round-11 verdict observation: raw string keys silently missed when
    // register and read used different aliases of the same directory; the
    // registry now resolves real paths on both sides
    import spark.implicits._
    val real = store // registered above under its real path
    val linkDir = graft.Scratch.dir("hp_link")
    val link = linkDir.resolve("alias")
    java.nio.file.Files.createSymbolicLink(link, java.nio.file.Path.of(real))
    // read through the SYMLINK: the rule must still fire
    val df = spark.read.parquet(link.toString)
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-06-01")
      .agg(count(lit(1)))
    assert(df.queryExecution.optimizedPlan.toString.contains("p_month"),
      "rule missed a symlink alias of a registered root")
    // and the inverse: register through an alias, read through the real path
    val link2 = linkDir.resolve("alias2")
    java.nio.file.Files.createSymbolicLink(link2, java.nio.file.Path.of(real))
    HiddenPartitions.register(link2.toString, Seq(
      HiddenPartitions.MonthOf("o_orderdate", "p_month")))
    val df2 = spark.read.parquet(real)
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" < "1995-06-01")
      .agg(count(lit(1)))
    assert(df2.queryExecution.optimizedPlan.toString.contains("p_month"))
  }

  test("month cover: inclusive start, exclusive end, empty range") {
    def micros(s: String) =
      java.time.LocalDate.parse(s).atStartOfDay(java.time.ZoneOffset.UTC)
        .toInstant.toEpochMilli * 1000L
    assert(HiddenPartitions.monthsBetween(micros("2024-01-15"), micros("2024-03-01"))
      == Seq("2024-01", "2024-02"))
    assert(HiddenPartitions.monthsBetween(micros("2024-01-01"), micros("2024-01-02"))
      == Seq("2024-01"))
    assert(HiddenPartitions.monthsBetween(micros("2024-02-01"), micros("2024-02-01"))
      .isEmpty)
    // end INSIDE a month still covers that month
    assert(HiddenPartitions.monthsBetween(micros("2024-01-15"), micros("2024-02-02"))
      == Seq("2024-01", "2024-02"))
  }
}
