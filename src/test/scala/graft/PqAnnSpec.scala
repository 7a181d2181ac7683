package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** v12's product-quantization retrieval: the output must be a complete,
  * exactly-reranked top-k (true cosines, not ADC approximations), and the
  * compressed index must still FIND most of what brute force finds — the
  * property PQ exists for. */
class PqAnnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("v12: complete per-query top-k with exact reranked cosines") {
    import spark.implicits._
    val rows = SparkEntry.queries("v12_pq_ann")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getLong(1)).sorted.toSeq == (1L to 10L))
      val cs = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosines not non-increasing in rank")
    }
    // emitted cosines are TRUE cosines of the original vectors
    val e = Tables(spark, sf).embeddings
      .withColumn("v", $"embedding".cast("array<double>"))
      .withColumn("n2", graft.functions.VectorExprs.dot($"v", $"v"))
    val byId = e.select($"vec_id", $"v", $"n2").collect()
      .map(r => r.getLong(0) -> (r.getSeq[Double](1).toArray, r.getDouble(2)))
      .toMap
    rows.foreach { r =>
      val (qv, qn) = byId(r.getLong(0))
      val (nv, nn) = byId(r.getLong(2))
      var d = 0.0; var i = 0
      while (i < qv.length) { d += qv(i) * nv(i); i += 1 }
      val cos = d / (math.sqrt(qn) * math.sqrt(nn))
      assert(r.getDouble(3) == cos, s"cos not the exact rerank value: $r")
    }
  }

  test("v12: candidate pool recalls most of the exact top-k") {
    val exact = SparkEntry.queries("v1_brute_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val pq = SparkEntry.queries("v12_pq_ann")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect pq).size.toDouble / exact.size
    // 4-byte codes + 50-candidate rerank over 100 vectors/query pool:
    // recall below this floor means the ADC ordering degenerated
    assert(recall >= 0.5, s"PQ recall collapsed: $recall")
  }
}
