package graft

import org.scalatest.funsuite.AnyFunSuite

/** e28's streamed packing map vs the batch g18 map, plus the
  * output-as-state replay contract: re-running the whole stream over the
  * already-populated output appends nothing (doc_id anti-join). */
class StreamSeqPackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  test("e28 streamed map == batch g18 map; full replay appends nothing") {
    val ingest = Scratch.dir("e28spec_in")
    val out = Scratch.dir("e28spec_out").resolve("pack").toString
    val first = rows(catalog.Streams.runStreamSeqPack(spark, sf, ingest, out))
    val batch = rows(SparkEntry.queries("g18_sequence_packing")(spark, sf))
    assert(first == batch,
      s"stream/batch diff: ${batch.zip(first).find { case (a, b) => a != b }}")
    // replay: same ingest files, no checkpoint — every doc re-arrives; the
    // anti-join must keep the output byte-identical
    val second = rows(catalog.Streams.runStreamSeqPack(spark, sf, ingest, out))
    assert(second == first, "replay changed the packing map")
    // the stream must actually have crossed batch boundaries mid-window
    assert(batch.exists(_._7 > 1), "no doc spans two windows — vacuous")
  }
}
