package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextKernels

/** d16's exact guarantee, proven against BRUTE-FORCE all-pairs cosine over
  * the same 4-gram shingle-tf vectors in plain Scala (no prefix filter, no
  * Spark) — independent of the prefix theorem both engines share, so a
  * prefix bug can't self-confirm through the DuckDB twin (d15's
  * PpjoinExactSpec convention). */
class CosineExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  /** non-distinct 4-gram shingle tf — d16's feature space. */
  private def shingleTf(text: String): Map[Long, Long] = {
    val ws = TextKernels.tokenize(text)
    if (ws.length < 4) Map.empty
    else ws.sliding(4).map(w => TextKernels.polyHash(w.mkString(" ")))
      .toSeq.groupBy(identity).map { case (h, hs) => h -> hs.size.toLong }
  }

  test("d16 equals brute-force all-pairs threshold cosine (recall 1.0 by construction)") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> shingleTf(r.getString(1)))
      .filter(_._2.nonEmpty).sortBy(_._1)
    val brute = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (d1, t1) = docs(i); (d2, t2) = docs(j)
      dot = t1.iterator.map { case (h, f) => f * t2.getOrElse(h, 0L) }.sum
      n21 = t1.valuesIterator.map(f => f * f).sum
      n22 = t2.valuesIterator.map(f => f * f).sum
      if dot * dot * 100 >= n21 * n22 * 81
    } yield (d1, d2, dot, n21, n22)).toSet

    val got = SparkEntry.queries("d16_cosine_threshold_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty, "no qualifying pairs in the fixture — vacuous test")
  }

  test("d16 candidates stay near the true pair count (the selectivity that makes it scale)") {
    import spark.implicits._
    // the round-7 scale finding this spec pins: on UNIGRAM features the
    // prefix index admits nearly all pairs (stopword df ≈ corpus size —
    // 11.9M candidates for 1,777 true pairs at sf0.1); on shingle features
    // df is corpus-sparse and candidates collapse to ≈ the answer. Guard
    // the ratio so a feature-space regression can't sneak back in.
    val tf = Tables(spark, sf).documents
      .select($"doc_id", expr(catalog.Tx.wsExpr).as("ws"))
      .select($"doc_id", explode(expr(catalog.Tx.shinglesAllExpr(4))).as("sg"))
      .select($"doc_id", expr(catalog.Tx.polyHash("sg")).as("h"))
      .groupBy($"doc_id", $"h").agg(count(lit(1)).as("tf"))
    val n2 = tf.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
    val dft = tf.groupBy($"h").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df", $"h")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefix = tf.join(n2, Seq("doc_id")).join(dft, Seq("h"))
      .withColumn("pre2", coalesce(sum($"tf" * $"tf").over(wDoc), lit(0L)))
      .filter(($"n2" - $"pre2") * 100 >= $"n2" * 81)
      .select($"doc_id", $"h")
    val cand = prefix.as("a").join(prefix.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id").distinct().count()
    val truePairs = SparkEntry.queries("d16_cosine_threshold_join")(spark, sf).count()
    val nDocs = Tables(spark, sf).documents.count()
    assert(cand < nDocs * (nDocs - 1) / 20,
      s"candidate set ($cand) is within 10x of all-pairs — prefix not selective")
    assert(cand <= truePairs * 50 + 100,
      s"candidates ($cand) far exceed true pairs ($truePairs)")
  }
}
