package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Quantizer

/** The quantizer's central claim: integer-exact Lloyd updates make the
  * trained model INDEPENDENT of physical parallelism — a float-summing
  * k-means would drift across partitionings and break the DuckDB oracle. */
class QuantizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def embeddings = {
    import spark.implicits._
    Tables(spark, "/root/testdata/sf0.001").embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
  }

  test("centroids are bitwise identical across partitionings") {
    val a = Quantizer.centroids(Quantizer.withQ(embeddings.repartition(1)),
      k = 8, iters = 2, dim = 64)
    val b = Quantizer.centroids(Quantizer.withQ(embeddings.repartition(13)),
      k = 8, iters = 2, dim = 64)
    assert(a.map(_.cell) == b.map(_.cell))
    a.zip(b).foreach { case (x, y) =>
      assert(x.cn2 == y.cn2, s"cn2 differs for cell ${x.cell}")
      assert(x.cv.sameElements(y.cv), s"cv differs for cell ${x.cell}")
    }
  }

  test("assignment matches the brute-force nearest centroid") {
    import spark.implicits._
    val e = embeddings
    val cents = Quantizer.centroids(Quantizer.withQ(e), k = 8, iters = 2, dim = 64)
    val assigned = Quantizer.assign(e, cents)
      .select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = e.collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1).toArray
      val n2 = r.getDouble(2)
      val best = cents.map { c =>
        var d = 0.0; var i = 0
        while (i < v.length) { d = d + v(i) * c.cv(i); i += 1 }
        (-d / (math.sqrt(n2) * math.sqrt(c.cn2)), c.cell)
      }.min
      assert(assigned(r.getLong(0)) == best._2, s"vec ${r.getLong(0)}")
    }
  }
}
