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

  test("e28 recovery guard: a torn (partially committed) batch is rolled back") {
    import org.apache.spark.sql.functions._
    val ingest = Scratch.dir("e28torn_in")
    val out = Scratch.dir("e28torn_out").resolve("pack").toString
    val clean = rows(catalog.Streams.runStreamSeqPack(spark, sf, ingest, out))
    // hand-tear the store: keep batch 0 complete but only HALF of batch 1's
    // rows — the state a crash between part-file write and job commit leaves
    val files = {
      val ls = java.nio.file.Files.list(ingest)
      try {
        val b = Seq.newBuilder[String]
        val it = ls.iterator(); while (it.hasNext) b += it.next().toString
        b.result().sorted
      } finally ls.close()
    }
    val b0max = spark.read.parquet(files.head).agg(max("doc_id")).head().getLong(0)
    val full = spark.read.parquet(out)
    val torn = full.filter(col("doc_id") <= b0max)
      .unionByName(full.filter(col("doc_id") > b0max && col("doc_id") % 2 === 0))
    val tmp = Scratch.dir("e28torn_tmp").resolve("t").toString
    torn.write.mode("overwrite").parquet(tmp)
    val outFs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    outFs.delete(new org.apache.hadoop.fs.Path(out), true)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(out)
    // resume: the guard must detect the torn batch, roll back to the batch-0
    // boundary, and re-pack batch 1 — landing byte-identical to the clean run
    val recovered = rows(catalog.Streams.runStreamSeqPack(spark, sf, ingest, out))
    assert(recovered == clean, "recovery after a torn batch diverged from the clean run")
  }
}
