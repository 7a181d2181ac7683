package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** g18's two-pass bucket-offset prefix must reproduce the SERIAL prefix sum
  * exactly — the property that makes the scalable plan correct. Token counts
  * are taken from the same shared expression both engines use, so this spec
  * isolates the prefix/window arithmetic. */
class SequencePackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("g18 == serial exclusive prefix + window math") {
    import spark.implicits._
    val nToks = Tables(spark, sf).documents
      .select($"doc_id", expr(s"size(${graft.catalog.Tx.wsExpr})").cast("long").as("n_tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val want = nToks.map { case (id, nt) =>
      val start = acc; acc += nt
      val winStart = start / 512
      val winEnd = (start + math.max(nt, 1) - 1) / 512
      (id, nt, start, winStart, winEnd, start % 512, winEnd - winStart + 1)
    }.toSeq
    val got = SparkEntry.queries("g18_sequence_packing")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want,
      s"first diff: ${want.zip(got).find { case (a, b) => a != b }}")
    // fixture must actually cross window boundaries
    assert(want.exists(_._7 > 1), "no doc spans two windows — vacuous")
  }
}
