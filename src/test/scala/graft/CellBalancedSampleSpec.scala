package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** g20's cell-balanced sample: per-cell output is exactly min(|cell|,
  * quota), picks are dense 1..n within each cell, and the selection is
  * reproducible (deterministic LCG order, no rand()). */
class CellBalancedSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("g20: per-cell counts are min(cell size, quota); picks dense; reproducible") {
    import spark.implicits._
    val quota = graft.catalog.Quantizer.CellTarget / 4
    val out = SparkEntry.queries("g20_cell_balanced_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // dense picks per cell
    out.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong))
      assert(rs.length <= quota)
    }
    // per-cell counts: min(|cell|, quota) against the engine's own cells
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents = graft.catalog.Quantizer.centroidsFor(e, sf, iters = 2, dim = 64)
    val cellSizes = graft.catalog.Quantizer.assign(e, cents)
      .groupBy($"cell").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0).toLong -> r.getLong(1)).toMap
    val outSizes = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    cellSizes.foreach { case (cell, n) =>
      assert(outSizes.getOrElse(cell, 0L) == math.min(n, quota),
        s"cell $cell: kept ${outSizes.getOrElse(cell, 0L)} of $n (quota $quota)")
    }
    // reproducible
    val again = SparkEntry.queries("g20_cell_balanced_sample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
  }
}
