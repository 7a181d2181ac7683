package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextKernels

/** x21's integer-rational BM25, proven against a from-scratch plain-Scala
  * recompute (tokenize → tf/df/dl/N/L → the 20·L common-denominator form →
  * bin()-length idf → top-10). Independent of the Spark plan AND the DuckDB
  * twin, so a shared-formula bug can't self-confirm. */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("x21 equals a plain-Scala BM25 recompute (score, hits, top-10 order)") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        TextKernels.tokenize(r.getString(1)).filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty)
    val n = docs.length.toLong
    val l = docs.map(_._2.size.toLong).sum
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (id, t) -> xs.size.toLong }
    }.toMap
    val df: Map[String, Long] =
      tf.keys.groupBy(_._2).map { case (t, ks) => t -> ks.size.toLong }
    val dl: Map[Long, Long] = docs.map { case (id, ts) => id -> ts.size.toLong }.toMap
    // query terms: df closest to N/10, tie-break token asc
    val q = df.toSeq.sortBy { case (t, d) => (math.abs(d * 10 - n), t) }.take(5)
    def idf(d: Long): Long = java.lang.Long.toBinaryString(n / d).length.toLong
    val scores: Map[Long, (Long, Long)] = docs.map { case (id, _) =>
      val hits = q.filter { case (t, _) => tf.contains((id, t)) }
      val s = hits.map { case (t, d) =>
        val f = tf((id, t))
        (44L * f * l * idf(d) * 10000L) / (20L * l * f + 6L * l + 18L * dl(id) * n)
      }.sum
      id -> (s, hits.size.toLong)
    }.filter(_._2._2 > 0).toMap
    val want = scores.toSeq
      .sortBy { case (id, (s, _)) => (-s, id) }.take(10)
      .map { case (id, (s, h)) => (id, dl(id), h, s, s.toDouble / 10000.0) }

    val got = SparkEntry.queries("x21_bm25_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getDouble(4))).toSeq
    assert(got == want, s"want=${want.take(3)}… got=${got.take(3)}…")
    assert(want.nonEmpty && want.head._4 > 0, "vacuous fixture — no scored docs")
  }
}
