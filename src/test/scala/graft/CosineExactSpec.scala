package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextKernels

/** d16's exact guarantee, proven against BRUTE-FORCE all-pairs tf-cosine in
  * plain Scala (no prefix filter, no Spark) — independent of the prefix
  * theorem both engines share, so a prefix bug can't self-confirm through
  * the DuckDB twin (d15's PpjoinExactSpec convention). */
class CosineExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("d16 equals brute-force all-pairs threshold cosine (recall 1.0 by construction)") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").collect()
      .map { r =>
        val tf = TextKernels.tokenize(r.getString(1))
          .map(TextKernels.polyHash)
          .groupBy(identity).map { case (h, hs) => h -> hs.length.toLong }
        r.getLong(0) -> tf
      }
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

  test("d16 prefixes exclude the heavy common-token tail (the index stays selective)") {
    import spark.implicits._
    // the operator's point at scale: the candidate index must not contain
    // every feature — the rare-first prefix rule has to cut the suffix.
    // Recompute prefix sizes the same way and check real pruning happened.
    val tf = Tables(spark, sf).documents
      .select($"doc_id", explode(expr(catalog.Tx.wsExpr)).as("tok"))
      .select($"doc_id", expr(catalog.Tx.polyHash("tok")).as("h"))
      .groupBy($"doc_id", $"h").agg(count(lit(1)).as("tf"))
    val total = tf.count()
    val n2 = tf.groupBy($"doc_id").agg(sum($"tf" * $"tf").as("n2"))
    val dft = tf.groupBy($"h").agg(count(lit(1)).as("df"))
    val wDoc = org.apache.spark.sql.expressions.Window
      .partitionBy($"doc_id").orderBy($"df", $"h")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val prefixRows = tf.join(n2, Seq("doc_id")).join(dft, Seq("h"))
      .withColumn("pre2", coalesce(sum($"tf" * $"tf").over(wDoc), lit(0L)))
      .filter(($"n2" - $"pre2") * 100 >= $"n2" * 81)
      .count()
    assert(prefixRows < total,
      s"prefix filter indexed every feature ($prefixRows of $total)")
  }
}
