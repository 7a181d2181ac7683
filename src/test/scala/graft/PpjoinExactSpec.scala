package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TextKernels

/** d15's exact guarantee, proven against a BRUTE-FORCE all-pairs Jaccard
  * computed in plain Scala (no prefix filter, no Spark) — independent of
  * the prefix logic both engines share, so a prefix-theorem bug can't
  * self-confirm through the DuckDB twin. */
class PpjoinExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("d15 equals brute-force all-pairs threshold Jaccard (recall 1.0 by construction)") {
    import spark.implicits._
    val docs = Tables(spark, sf).documents
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) ->
        TextKernels.shingles4(TextKernels.tokenize(r.getString(1)))
          .map(TextKernels.polyHash).toSet)
      .filter(_._2.nonEmpty).sortBy(_._1)
    val brute = (for {
      i <- docs.indices.iterator
      j <- (i + 1) until docs.length
      (d1, s1) = docs(i); (d2, s2) = docs(j)
      inter = (s1 intersect s2).size
      union = s1.size + s2.size - inter
      if inter.toDouble / union >= 0.5
    } yield (d1, d2, inter.toLong, union.toLong)).toSet

    val got = SparkEntry.queries("d15_ppjoin_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == brute,
      s"missed=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    // the fixture must actually exercise the operator
    assert(brute.nonEmpty, "no qualifying pairs in the fixture — vacuous test")
  }

  test("d15 finds pairs that d4's df-cap drops or d2's bands can miss (strict superset-or-equal)") {
    val exact = SparkEntry.queries("d15_ppjoin_exact")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = SparkEntry.queries("d4_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // d4 computes intersections only over df<=MaxDf shingles, so its
    // jaccard is an UNDERestimate: every d4 pair at >=0.5 is also a d15
    // pair, never the reverse
    assert(capped.subsetOf(exact), s"d4 pairs missing from d15: ${capped -- exact}")
  }
}
