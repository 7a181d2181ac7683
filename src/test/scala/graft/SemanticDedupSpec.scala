package graft

import org.scalatest.funsuite.AnyFunSuite

/** d17's keep/drop verdict, derived independently from d5's oracle-pinned
  * pair set: dropped == appears as the larger id of some qualifying pair.
  * Also pins the gate's safety property — every non-empty quantizer cell
  * keeps at least one representative (the cell's min id can never drop). */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("d17 verdict == min-id greedy over d5's pair set, covering every vector") {
    val pairs = SparkEntry.queries("d5_embedding_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dropped = pairs.map(_._2)
    val got = SparkEntry.queries("d17_semantic_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val nVecs = Tables(spark, sf).embeddings.count()
    assert(got.length.toLong == nVecs, "gate must cover every vector")
    got.foreach { case (id, _, kept) =>
      assert(kept == !dropped.contains(id), s"vec $id: kept=$kept")
    }
    assert(dropped.nonEmpty, "vacuous fixture — no near-dups at the threshold")
  }

  test("every non-empty cell keeps at least one representative") {
    val rows = SparkEntry.queries("d17_semantic_dedup")(spark, sf).collect()
      .map(r => (r.getLong(1), r.getBoolean(2)))
    val byCell = rows.groupBy(_._1)
    byCell.foreach { case (cell, xs) =>
      assert(xs.exists(_._2), s"cell $cell dropped all ${xs.length} members")
    }
  }
}
