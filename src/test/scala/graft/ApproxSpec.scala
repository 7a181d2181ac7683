package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate aggregates can't hash-match an oracle (different sketch
  * implementations), so they are bounded against the exact answer instead:
  * HLL++ within its configured rsd, approx percentile within quantile
  * tolerance. */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def li = Tables(spark, "/root/testdata/sf0.01").lineitem

  test("approx_count_distinct within 3x rsd of exact") {
    val r = li.agg(
      countDistinct($"l_partkey").as("exact"),
      approx_count_distinct($"l_partkey", 0.05).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.15, s"approx=$approx exact=$exact err=$err")
  }

  test("approx_percentile within quantile tolerance of exact percentile") {
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact50"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx50")).head()
    val exact = r.getDouble(0)
    val approx = r.getAs[Number](1).doubleValue()
    // quantity range is bounded; accuracy 1000 → within a few units
    assert(math.abs(approx - exact) <= 2.0, s"approx=$approx exact=$exact")
  }

  test("a4 query (rows-only in the oracle) returns one row per group with sane bounds") {
    val rows = SparkEntry.queries("a4_approx_distinct")(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
  }
}
