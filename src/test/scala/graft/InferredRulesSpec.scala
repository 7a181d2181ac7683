package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dq13's inferred-expectation audit: the derived bounds must equal the
  * reference partition's true min/max, violation counts must match a
  * plain-Scala recount, and auditing the reference against itself must
  * pass every rule (a contract that rejects its own training data is
  * wrong by construction). */
class InferredRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("dq13: bounds and counts match a plain-Scala recount") {
    import spark.implicits._
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val rows = Tables(spark, sf).lineitem
      .select((col("l_orderkey") +: cols.map(c => col(c).cast("double"))): _*)
      .collect()
    val ref = rows.filter(_.getLong(0) % 10 != 0)
    val tgt = rows.filter(_.getLong(0) % 10 == 0)
    val got = SparkEntry.queries("dq13_inferred_rules")(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == cols.sorted)
    got.foreach { r =>
      val i = cols.indexOf(r.getString(0)) + 1
      val vals = ref.map(_.getDouble(i))
      assert(r.getDouble(1) == vals.min && r.getDouble(2) == vals.max)
      assert(r.getLong(3) == tgt.length)
      assert(r.getLong(4) == tgt.count(_.getDouble(i) < vals.min))
      assert(r.getLong(5) == tgt.count(_.getDouble(i) > vals.max))
      assert(r.getBoolean(7) ==
        (r.getLong(4) + r.getLong(5) + r.getLong(6) == 0L))
    }
  }
}
