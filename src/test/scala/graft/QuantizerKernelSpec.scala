package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Quantizer
import graft.catalog.Quantizer.Centroid
import graft.functions.QuantizerKernels

/** The native NearestCells kernel must reproduce EXACTLY the literal
  * expression form it replaced: `array_min(array(struct(-cos, cell), …))`
  * for assignment and `slice(array_sort(…), 1, nProbe)` for probing —
  * same serial-fold dot, same `sqrt(norm2) * sqrt(cn2)` op order, same
  * (neg, cell) struct ordering incl. the -0.0 == 0.0 / tie-on-cell cases.
  * Pinned on random centroids/vectors, on an exact-tie construction, and
  * on both evaluation paths. */
class QuantizerKernelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rnd = new scala.util.Random(4242)

  private def mkCents(k: Int, dim: Int): Seq[Centroid] =
    (0 until k).map { c =>
      val cv = Array.fill(dim)(rnd.nextDouble() * 2 - 1)
      Centroid(c, cv, cv.map(x => x * x).sum)
    }

  private def mkVecs(n: Int, dim: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))

  private def frame(vecs: Seq[(Long, Seq[Double])]) =
    vecs.toDF("vec_id", "v")
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))

  private def compare(k: Int, dim: Int, nProbe: Int): Unit = {
    val cents = mkCents(k, dim)
    val df = frame(mkVecs(200, dim))
    val litSorted = Quantizer.sortedCells(cents)
    val kernel1 = QuantizerKernels.nearestCells($"v", $"norm2",
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), 1)
    val kernelN = QuantizerKernels.nearestCells($"v", $"norm2",
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), nProbe)
    val rows2 = df
      .withColumn("_litsorted", litSorted)
      .withColumn("lit_one", array_min($"_litsorted").getField("cell"))
      .withColumn("k_one", kernel1)
      .withColumn("lit_n",
        expr(s"transform(slice(_litsorted, 1, $nProbe), s -> s.cell)"))
      .withColumn("k_n", kernelN)
      .select($"vec_id", $"lit_one", $"k_one", $"lit_n", $"k_n")
      .collect()
    rows2.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"assign mismatch vec ${r.getLong(0)}")
      assert(r.getSeq[Int](3) == r.getSeq[Int](4),
        s"probe mismatch vec ${r.getLong(0)}")
    }
    assert(rows2.nonEmpty)
  }

  test("kernel == literal form, random centroids, codegen path") {
    compare(k = 8, dim = 64, nProbe = 2)
    compare(k = 3, dim = 8, nProbe = 3)
    compare(k = 16, dim = 16, nProbe = 16)
  }

  test("kernel == literal form, interpreted path") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      compare(k = 8, dim = 64, nProbe = 2)
    }
  }

  test("exact ties break on cell ascending, both forms") {
    // two identical centroids (cells 0 and 1) → every row ties exactly
    val cv = Array.fill(16)(0.25)
    val cents = Seq(Centroid(0, cv, cv.map(x => x * x).sum),
                    Centroid(1, cv, cv.map(x => x * x).sum),
                    Centroid(2, cv.map(-_), cv.map(x => x * x).sum))
    val df = frame(mkVecs(50, 16))
    val litSorted = Quantizer.sortedCells(cents)
    val kernel1 = QuantizerKernels.nearestCells($"v", $"norm2",
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), 1)
    val kernel2 = QuantizerKernels.nearestCells($"v", $"norm2",
      cents.map(_.cell), cents.map(_.cv),
      cents.map(c => java.lang.Math.sqrt(c.cn2)), 2)
    val rows = df
      .withColumn("_ls", litSorted)
      .withColumn("lit_one", array_min($"_ls").getField("cell"))
      .withColumn("k_one", kernel1)
      .withColumn("lit_2", expr("transform(slice(_ls, 1, 2), s -> s.cell)"))
      .withColumn("k_2", kernel2)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("lit_one") == r.getAs[Int]("k_one"))
      assert(r.getSeq[Int](r.fieldIndex("lit_2")) ==
             r.getSeq[Int](r.fieldIndex("k_2")))
    }
  }

  private def withSQLConf(kvs: (String, String)*)(f: => Unit): Unit = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
