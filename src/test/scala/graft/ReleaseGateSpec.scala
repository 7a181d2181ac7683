package graft

import org.scalatest.funsuite.AnyFunSuite

/** c7's composed release gate: the released set must equal the plain-Scala
  * composition of its pinned stages — x22-clean ∩ d17-kept, LCG-capped per
  * cell — both upstream gates must actually fire, and the packed windows
  * must be well-formed (one class per window, slots dense under the class
  * capacity, no document split). */
class ReleaseGateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf
  private val P = 2147483647L

  test("c7: released set == clean ∩ kept capped per cell; gates fire; windows well-formed") {
    val out = SparkEntry.queries("c7_release_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val clean = SparkEntry.queries("x22_semantic_decontam")(spark, sf).collect()
      .filter(_.getBoolean(3)).map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("d17_semantic_dedup")(spark, sf).collect()
      .filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // plain-Scala re-composition of stages 1-3
    val surv = clean.filter { case (id, _) => kept.contains(id) }
    val quota = graft.catalog.Quantizer.CellTarget / 4
    def key(id: Long): Long = ((id % P) * 48271L + 13L) % P
    val want = surv.groupBy(_._2).flatMap { case (_, members) =>
      members.keys.toSeq.sortBy(id => (key(id), id)).take(quota.toInt)
    }.toSet
    assert(out.map(_._1).toSet == want,
      "released docs differ from the re-composed clean ∩ kept ∩ cap set")
    // both gates fire on the fixture (the intersection is not vacuous)
    val corpus = SparkEntry.queries("x22_semantic_decontam")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(corpus.exists(id => !clean.contains(id) && kept.contains(id)),
      "decontamination gate never fired alone")
    assert(corpus.exists(id => clean.contains(id) && !kept.contains(id)),
      "dedup gate never fired alone")
    // picks dense per cell, bounded by quota
    out.groupBy(_._2).values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length.toLong))
      assert(rs.length <= quota)
    }
    // windows: one class per win_id, slots dense under the class capacity,
    // capacity respected (cls tokens of cls-class docs fit 512 by
    // construction; cls 0 = oversize, capacity 1)
    out.groupBy(_._6).values.foreach { rs =>
      val classes = rs.map(_._5).distinct
      assert(classes.length == 1, s"window mixes classes: $rs")
      val cap = if (classes.head == 0L) 1L else classes.head
      assert(rs.length <= cap)
      assert(rs.map(_._7).sorted.toSeq == (0L until rs.length.toLong))
      rs.foreach(r => if (r._5 != 0L) assert(r._5 * r._4 <= 512L))
    }
  }
}
