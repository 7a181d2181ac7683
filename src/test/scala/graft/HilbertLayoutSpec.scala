package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** g17's claims, pinned beyond the DuckDB hash-match:
  *  1. the expression chain IS a Hilbert curve — a plain-Scala port of
  *     Skilling's transform is exhaustively verified (bijection + every
  *     consecutive pair of curve positions is one grid step apart) at 2
  *     and 3 bits/dim, and the Spark column matches it row for row;
  *  2. the production claim: under equal-frequency packing the Hilbert
  *     layout's per-file zone maps are strictly tighter than the z-curve's
  *     on the same data — the property g17 exists for. */
class HilbertLayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** Skilling's AxestoTranspose + bit interleave, parametric bits/dim. */
  private def hilbertRef(xi: Long, yi: Long, wi: Long, b: Int): Long = {
    val X = Array(xi, yi, wi)
    val M = 1L << (b - 1)
    var q = M
    while (q > 1) {
      val p = q - 1
      var i = 0
      while (i < 3) {
        if ((X(i) & q) != 0) X(0) ^= p
        else { val t = (X(0) ^ X(i)) & p; X(0) ^= t; X(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    X(1) ^= X(0); X(2) ^= X(1)
    var t = 0L
    q = M
    while (q > 1) { if ((X(2) & q) != 0) t ^= q - 1; q >>= 1 }
    var i = 0
    while (i < 3) { X(i) ^= t; i += 1 }
    var h = 0L
    var bit = 0
    while (bit < b) {
      h |= ((X(0) >> bit) & 1) << (3 * bit + 2)
      h |= ((X(1) >> bit) & 1) << (3 * bit + 1)
      h |= ((X(2) >> bit) & 1) << (3 * bit)
      bit += 1
    }
    h
  }

  private def zRef(x: Long, y: Long, w: Long): Long = {
    var z = 0L
    var b = 0
    while (b < 8) {
      z |= ((x >> b) & 1) << (3 * b)
      z |= ((y >> b) & 1) << (3 * b + 1)
      z |= ((w >> b) & 1) << (3 * b + 2)
      b += 1
    }
    z
  }

  test("hilbert transform: exhaustive bijection + unit-step adjacency at 2 and 3 bits") {
    Seq(2, 3).foreach { b =>
      val side = 1 << b
      val byH = (for {
        x <- 0 until side; y <- 0 until side; w <- 0 until side
      } yield hilbertRef(x, y, w, b) -> (x, y, w)).toMap
      assert(byH.size == side * side * side, s"not a bijection at b=$b")
      (0 until side * side * side - 1).foreach { h =>
        val (a, c) = (byH(h.toLong), byH(h.toLong + 1))
        val d = math.abs(a._1 - c._1) + math.abs(a._2 - c._2) + math.abs(a._3 - c._3)
        assert(d == 1, s"curve jumps at h=$h (b=$b): $a -> $c")
      }
    }
  }

  test("g17's expression chain equals the plain-Scala reference on real data") {
    import spark.implicits._
    val pts = catalog.Analytics.hilbertIndex(
      Tables(spark, sf).events.select(
        expr("user_id % 256").as("x"),
        expr("(hour(ts) * 60 + minute(ts)) div 6").as("y"),
        expr("least(255L, cast(round(value * 100) as bigint) div 192)").as("w")))
      .select($"x", $"y", $"w", $"h").as[(Long, Long, Long, Long)].collect()
    assert(pts.nonEmpty)
    pts.foreach { case (x, y, w, h) =>
      assert(h == hilbertRef(x, y, w, 8), s"chain diverges at ($x,$y,$w)")
    }
  }

  test("equal-frequency packing: hilbert zone maps strictly tighter than z-order") {
    import spark.implicits._
    val data = Tables(spark, sf).events.select(
        expr("user_id % 256").as("x"),
        expr("(hour(ts) * 60 + minute(ts)) div 6").as("y"),
        expr("least(255L, cast(round(value * 100) as bigint) div 192)").as("w"))
      .as[(Long, Long, Long)].collect()
    // g17's packing rule on both curves: 15 type-1 order statistics as
    // boundaries, file = # boundaries strictly below the curve key
    def spanSum(key: (Long, Long, Long) => Long): Long = {
      val keyed = data.map { case (x, y, w) => (key(x, y, w), x, y, w) }.sortBy(_._1)
      val n = keyed.length
      val bounds = (1 to 15).map(k => keyed(((n - 1) * k) / 16)._1)
      keyed.groupBy(r => bounds.count(_ < r._1)).values.map { f =>
        (f.map(_._2).max - f.map(_._2).min + 1) +
          (f.map(_._3).max - f.map(_._3).min + 1) +
          (f.map(_._4).max - f.map(_._4).min + 1)
      }.sum
    }
    val hSum = spanSum(hilbertRef(_, _, _, 8))
    val zSum = spanSum(zRef)
    assert(hSum < zSum,
      s"hilbert packing not tighter: hilbert=$hSum zorder=$zSum")
  }

  test("g17: 16 files partition the table") {
    import spark.implicits._
    val out = SparkEntry.queries("g17_hilbert_layout")(spark, sf).collect()
    assert(out.length == 16, s"expected 16 files, got ${out.length}")
    assert(out.map(_.getAs[Long]("n")).sum == Tables(spark, sf).events.count())
  }
}
