package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** End-to-end file-source streaming: readStream over the events parquet,
  * AvailableNow trigger, checkpointed parquet sink — the deployment shape
  * (ingest directory → incremental job). Results must equal the batch twin.
  * Uses sf0.001 and complete-free append aggregation: the final watermark
  * pass closes every window because AvailableNow drains the source. */
class StreamFileSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("AvailableNow file-source tumbling counts == batch on events parquet") {
    val batchEvents = Tables(spark, TestSpark.sf).events
    val path = s"${TestSpark.sf}/events.parquet"

    // stream the RAW file (ts stored as nanos→long, see Tables.events) and
    // apply the same micros conversion on the streaming frame; the file
    // streaming source wants an ingest DIRECTORY, so stage the file into one
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(path).schema
    val ingestDir = Files.createTempDirectory("graft_ingest")
    Files.copy(java.nio.file.Paths.get(path), ingestDir.resolve("events_0.parquet"))
    val streamEvents = spark.readStream.schema(rawSchema).parquet(ingestDir.toString)
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))

    val work = Files.createTempDirectory("graft_stream")
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString

    val q = EventStreams.tumblingCounts(streamEvents, watermark = "0 seconds")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(outDir)
      .collect().map(_.mkString("|")).toSet
    val want = EventStreams.tumblingCounts(batchEvents)
      .collect().map(_.mkString("|")).toSet

    // append mode emits only windows the final watermark passed; with the
    // source drained and watermark 0s, that is every window except those
    // at/after the max event time. Require ≥95% coverage and exact equality
    // on emitted windows.
    assert(got.nonEmpty, "no streaming output")
    assert(got.subsetOf(want), s"streaming rows not in batch: ${got -- want}")
    assert(got.size >= (want.size * 95) / 100,
      s"too few windows closed: ${got.size} of ${want.size}")
  }
}
