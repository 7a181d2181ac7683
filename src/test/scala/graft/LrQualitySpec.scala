package graft

import org.scalatest.funsuite.AnyFunSuite

/** x29's distributed logistic regression vs a plain-Scala serial-GD twin.
  *
  * The operator's claim is that 3 full-batch GD iterations computed as
  * map-side-combined fixed-point aggregates are EXACTLY the serial
  * computation — order-independence comes from quantizing each per-doc
  * gradient contribution to round(g·2²⁴) BIGINT before summation, and the
  * weight/score arithmetic is pure IEEE add/mul/div/abs. The twin folds
  * the collected feature rows one by one (any order — integer sums
  * commute) using the same rational sigmoid and the same HALF_UP rounding
  * Spark's `round` applies (BigDecimal.valueOf semantics), then asserts
  * the final weights AND the confusion cells match bitwise.
  */
class LrQualitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sparkRound(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  test("x29: distributed fixed-point GD equals the serial twin bitwise") {
    val sf = TestSpark.sf
    val (wDist, f) = catalog.Text.trainLrQuality(spark, sf)
    val rows = f.collect().map { r =>
      (Array(1.0, r.getDouble(1), r.getDouble(2), r.getDouble(3),
             r.getDouble(4)), r.getDouble(5))
    }
    assert(rows.nonEmpty)
    val S = catalog.Text.LrScale
    val n = rows.length.toDouble
    def z(w: Array[Double], x: Array[Double]): Double =
      ((((w(0) + w(1) * x(1)) + w(2) * x(2)) + w(3) * x(3)) + w(4) * x(4))
    def sigma(zz: Double): Double = 0.5 + 0.5 * zz / (1.0 + math.abs(zz))
    var w = Array.fill(5)(0.0)
    for (_ <- 1 to catalog.Text.LrIters) {
      val g = Array.fill(5)(0L)
      rows.foreach { case (x, y) =>
        val d = sigma(z(w, x)) - y
        var j = 0
        while (j < 5) { g(j) += sparkRound(d * x(j) * S); j += 1 }
      }
      w = Array.tabulate(5)(j => w(j) - catalog.Text.LrEta * ((g(j).toDouble / S) / n))
    }
    assert(wDist.toSeq == w.toSeq,
      s"distributed weights ${wDist.toSeq} != serial twin ${w.toSeq}")

    // confusion cells from the twin == the entry's committed output
    val twin = rows.groupBy { case (x, y) =>
      (y.toLong, if (z(w, x) >= 0.0) 1L else 0L)
    }.map { case (k, rs) =>
      (k._1, k._2, rs.length.toLong,
       rs.map { case (x, _) => sparkRound(sigma(z(w, x)) * S) }.sum)
    }.toSeq.sorted
    val got = SparkEntry.queries("x29_lr_quality_filter")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted
    assert(got == twin, s"confusion diverged:\n got=$got\n twin=$twin")
    // the learned filter must actually separate something: both labels
    // present, and at least one cell on the diagonal
    assert(twin.map(_._1).distinct.size == 2, "label predicate is constant")
  }
}
