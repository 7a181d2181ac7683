package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Quantizer

/** d18's incremental verdict, re-derived in plain Scala from the engine's
  * own cell assignments (assignment itself is pinned by QuantizerSpec and
  * the e24 oracle): dropped iff an index KEEPER cell-mate or a smaller-id
  * batch cell-mate sits at cos ≥ 0.4. */
class IncrementalSemanticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def cos(a: Array[Double], b: Array[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

  test("d18 == plain-Scala verdict over engine cell assignments; both drop paths exist") {
    import spark.implicits._
    val all = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val idxE = all.filter(pmod($"vec_id", lit(10)) =!= 7)
    val batch = all.filter(pmod($"vec_id", lit(10)) === 7)
    val cents = Quantizer.centroidsOnIndexFor(idxE, sf, "idx7", iters = 2, dim = 64)
    def cells(df: org.apache.spark.sql.DataFrame) =
      Quantizer.assign(df, cents).select($"vec_id", $"cell", $"v").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val idx = cells(idxE)
    val b = cells(batch)
    val idxByCell = idx.groupBy(_._2)
    val keeperSet = idx.filter { case (id, c, v) =>
      !idxByCell(c).exists { case (id2, _, v2) => id2 < id && cos(v2, v) >= 0.4 }
    }
    val keepersByCell = keeperSet.groupBy(_._2)
    val bByCell = b.groupBy(_._2)
    val expected = b.sortBy(_._1).map { case (id, c, v) =>
      val byKeeper = keepersByCell.getOrElse(c, Array.empty)
        .exists { case (_, _, kv) => cos(kv, v) >= 0.4 }
      val byBatch = bByCell(c)
        .exists { case (id2, _, v2) => id2 < id && cos(v2, v) >= 0.4 }
      (id, c.toLong, !(byKeeper || byBatch), byKeeper, byBatch)
    }
    val got = SparkEntry.queries("d18_incremental_semantic")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    assert(got == expected.map(e => (e._1, e._2, e._3)).toSeq,
      s"first diff: ${expected.map(e => (e._1, e._2, e._3)).zip(got)
        .find { case (a, g) => a != g }}")
    // the INDEX-keeper path (the incremental leg) must actually fire
    assert(expected.exists(e => e._4), "no batch vector dropped by an index keeper")
    assert(expected.exists(e => !e._3), "verdict never drops — vacuous")
  }
}
