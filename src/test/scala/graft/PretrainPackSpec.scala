package graft

import org.scalatest.funsuite.AnyFunSuite

/** c5's composed pipeline, re-derived from its individually-pinned stages:
  * survivor set == (x2 stop-ratio gate) ∩ (d17 kept), packing == serial
  * exclusive prefix over survivors in doc_id order. */
class PretrainPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("c5 == x2-gate ∩ d17-kept, packed by serial prefix") {
    val x2 = SparkEntry.queries("x2_quality_score")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap // n_tokens, stop_cnt
    val d17 = SparkEntry.queries("d17_semantic_dedup")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val survivors = x2.keySet.intersect(d17.keySet).toSeq.sorted.filter { id =>
      val (nTok, stopCnt) = x2(id)
      d17(id)._2 && stopCnt * 1000 <= nTok * 180
    }
    var acc = 0L
    val want = survivors.map { id =>
      val (nTok, stopCnt) = x2(id)
      val start = acc; acc += nTok
      (id, d17(id)._1, stopCnt * 1000 / nTok, nTok, start,
       start / 512, (start + math.max(nTok, 1) - 1) / 512)
    }
    val got = SparkEntry.queries("c5_pretrain_pack")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
                 r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want, s"first diff: ${want.zip(got).find { case (a, b) => a != b }}" +
      s" sizes got=${got.size} want=${want.size}")
    // the gates must each bite: some doc fails the stop gate, some the verdict
    assert(survivors.size < x2.size, "no doc dropped — vacuous composition")
    assert(x2.keys.exists { id =>
      val (nTok, stopCnt) = x2(id); stopCnt * 1000 > nTok * 180 },
      "stop-ratio gate never fires")
    assert(d17.values.exists(!_._2), "semantic verdict never fires")
  }
}
