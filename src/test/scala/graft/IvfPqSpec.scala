package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** v19's IVF-PQ residual retrieval: the output must be a complete,
  * exactly-reranked top-k, candidates must come only from probed cells,
  * and — the property residual encoding EXISTS for — the residual codes
  * must reconstruct the corpus with lower error than v12's direct codes
  * under the identical code budget. The encoder twin here is independent
  * plain Scala (no Spark expressions), so a Spark-side encoding bug
  * cannot self-confirm.
  */
class IvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  // the shipped quantizer configuration — retunes flow into the spec
  private val PqM = catalog.Similarity.PqM
  private val PqSub = catalog.Similarity.PqSub
  private val PqKs = catalog.Similarity.PqKs

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }

  test("v19: complete per-query top-k with exact reranked cosines") {
    import spark.implicits._
    val rows = SparkEntry.queries("v19_ivfpq_ann")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosines not non-increasing in rank")
    }
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("n2", graft.functions.VectorExprs.dot($"v", $"v"))
    val byId = e.select($"vec_id", $"v", $"n2").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (qv, qn) = byId(r.getLong(0))
      val (nv, nn) = byId(r.getLong(2))
      val cos = dot(qv, nv) / (math.sqrt(qn) * math.sqrt(nn))
      assert(r.getDouble(3) == cos, s"cos not the exact rerank value: $r")
    }
  }

  test("v19: residual codes reconstruct better than direct codes") {
    import spark.implicits._
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("norm2", graft.functions.VectorExprs.dot($"v", $"v"))
      .select($"vec_id", $"v", $"norm2")
    val cents =
      graft.catalog.Quantizer.centroidsFor(e, sf, iters = 2, dim = 64)
    val rows = e.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cvOf = cents.map(c => c.cell -> c.cv).toMap
    def cellOf(v: Array[Double], n2: Double): Int = {
      // cos desc, cell asc — cents are cell-ascending, strict > keeps first
      var bc = -1; var best = Double.NegativeInfinity
      cents.foreach { c =>
        val cos = dot(v, c.cv) / (math.sqrt(n2) * math.sqrt(c.cn2))
        if (cos > best) { best = cos; bc = c.cell }
      }
      bc
    }
    val direct = rows.map { case (id, v, _) => id -> v }.toMap
    val residual = rows.map { case (id, v, n2) =>
      val cv = cvOf(cellOf(v, n2))
      id -> Array.tabulate(v.length)(i => v(i) - cv(i))
    }.toMap
    // mean squared PQ reconstruction error with seeds = rows vec_id < PqKs
    def msError(vecs: Map[Long, Array[Double]]): Double = {
      val seeds = (0L until PqKs.toLong).map(vecs)
      var tot = 0.0
      vecs.values.foreach { x =>
        for (m <- 0 until PqM) {
          val t = java.util.Arrays.copyOfRange(x, m * PqSub, (m + 1) * PqSub)
          var bd = Double.PositiveInfinity; var bc: Array[Double] = null
          seeds.foreach { sv =>
            val c = java.util.Arrays.copyOfRange(sv, m * PqSub, (m + 1) * PqSub)
            val d2 = dot(c, c) - 2.0 * dot(t, c) // ||t−c||² − ||t||², same argmin
            if (d2 < bd) { bd = d2; bc = c }
          }
          var i = 0
          while (i < PqSub) { val d = t(i) - bc(i); tot += d * d; i += 1 }
        }
      }
      tot / vecs.size
    }
    val dErr = msError(direct)
    val rErr = msError(residual)
    info(f"direct MSE=$dErr%.6f residual MSE=$rErr%.6f")
    assert(rErr < dErr,
      s"residual encoding did not reduce reconstruction error: $rErr vs $dErr")
  }

  test("v19: candidate pool recalls most of the exact top-k") {
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = SparkEntry.queries("v19_ivfpq_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect got).size.toDouble / exact.size
    info(f"v19 recall@10 = $recall%.2f")
    // 2-probe IVF restriction + 4-byte residual codes: below this floor
    // the ADC ordering or the cell routing degenerated
    assert(recall >= 0.5, s"IVF-PQ recall collapsed: $recall")
  }
}
