package graft

import org.scalatest.funsuite.AnyFunSuite

/** e30's streaming quarantine: replaying the FULL stream over already-
  * populated stores must append nothing (at-least-once idempotence via
  * the o_orderkey anti join on both sides of the split), and the corrupt
  * and clean stores must partition the feed exactly.
  */
class StreamQuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("e30: full replay appends nothing; stores partition the feed") {
    val clean = Scratch.dir("e30spec_c").resolve("c").toString
    val quar = Scratch.dir("e30spec_q").resolve("q").toString
    val first = catalog.Streams
      .runStreamQuarantine(spark, sf, Some((clean, quar))).collect()
    assert(first.length == 1)
    val nClean = first(0).getLong(0)
    val nQuar = first(0).getLong(1)
    assert(nClean > 0 && nQuar > 0, "fixture must produce both splits")
    val total = Tables(spark, sf).orders.count()
    assert(nClean + nQuar == total, "stores must partition the feed")
    // replay: same ingest files, same stores — byte-identical audit
    val second = catalog.Streams
      .runStreamQuarantine(spark, sf, Some((clean, quar))).collect()
    assert(second.toSeq == first.toSeq, "replay must append nothing")
    // no key appears in both stores
    val both = spark.read.parquet(clean).select("o_orderkey")
      .join(spark.read.parquet(quar).select("o_orderkey"), Seq("o_orderkey"))
      .count()
    assert(both == 0, "a key must land in exactly one store")
  }
}
