package graft

import org.scalatest.funsuite.AnyFunSuite

/** v18's JL sketch, proven against a from-scratch plain-Scala recompute:
  * quantization, sign hash, projections, integer dot, the guarded cosp,
  * per-query ranking, and the true-cosine audit column. */
class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private val P = 2147483647L

  private def proj(v: Array[Double]): Array[Long] = {
    val q = v.map(x => math.round(x * 4096))
    Array.tabulate(8) { k =>
      var a = 0L
      var d = 0
      while (d < 64) {
        val s = 1L - 2L * (((1315423911L * k + 2654435761L * d) % P) % 2)
        a += s * q(d)
        d += 1
      }
      a
    }
  }

  test("v18 == plain-Scala sketch search (projection, ranking, audit cosine)") {
    import spark.implicits._
    val vecs = Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding".cast("array<double>")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    val sk = vecs.map { case (id, v) =>
      val p = proj(v)
      (id, v, p, p.map(x => x * x).sum)
    }
    def dotd(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val want = (for {
      (qid, qv, qp, qpn2) <- sk.iterator.filter(_._1 < 10)
    } yield {
      val ranked = sk.filter(_._1 != qid).map { case (cid, cv, cp, cpn2) =>
        val dotp = (0 until 8).map(i => qp(i) * cp(i)).sum
        val cosp = dotp.toDouble / math.sqrt(math.max(qpn2 * cpn2, 1L).toDouble)
        val cosT = dotd(qv, cv) / (math.sqrt(dotd(qv, qv)) * math.sqrt(dotd(cv, cv)))
        (cid, dotp, cosp, cosT)
      }.sortBy { case (cid, _, cosp, _) => (-cosp, cid) }.take(10)
      ranked.zipWithIndex.map { case ((cid, dotp, cosp, cosT), i) =>
        (qid, (i + 1).toLong, cid, dotp, cosp, cosT)
      }
    }).flatten.toSeq
    val got = SparkEntry.queries("v18_random_projection")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4), r.getDouble(5))).toSeq
    assert(got.size == want.size, s"rows: got ${got.size} want ${want.size}")
    got.zip(want).foreach { case (g, w) =>
      assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4,
        s"rank/id/dotp mismatch: got $g want $w")
      assert(g._5 == w._5, s"cosp not bitwise-identical: got $g want $w")
      assert(math.abs(g._6 - w._6) < 1e-12, s"cos_true drift: got $g want $w")
    }
  }
}
