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
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions.{col, expr, timestamp_micros, unix_micros}
  import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

  /** Mirror of the product-side `ts` guard (Tables.events / Streams
    * .eventsStream): the driver's events.parquet has shipped both
    * nanos-as-long and TIMESTAMP_MICROS-NTZ encodings — normalize either
    * to TIMESTAMP so the spec survives any testdata vintage. */
  private def normTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType          => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType  => df.withColumn("ts", col("ts").cast(TimestampType))
    case _                 => df
  }

  /** A monotone LONG image of `ts` for quantile-splitting, whatever the
    * physical encoding (nanos-long stays raw; timestamps become micros). */
  private def tsAsLong(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType         => col("ts")
    case TimestampNTZType => unix_micros(col("ts").cast(TimestampType))
    case _                => unix_micros(col("ts"))
  }

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
    val streamEvents =
      normTs(spark.readStream.schema(rawSchema).parquet(ingestDir.toString))

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

  test("kill + resume from checkpoint is exactly-once into the parquet sink") {
    val path = s"${TestSpark.sf}/events.parquet"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)

    // stage the source as FOUR TIME-RANGED files (increasing mtimes) so
    // maxFilesPerTrigger=1 forces four micro-batches that arrive in event-
    // time order — a random split would let batch 1's watermark jump to the
    // global max and correctly drop everything later as late data
    val ingestDir = Files.createTempDirectory("graft_ingest4")
    val keyed = raw.withColumn("__ts_split", tsAsLong(raw))
    val cuts = keyed.stat.approxQuantile("__ts_split", Array(0.25, 0.5, 0.75), 0.0)
    val bounds = (Long.MinValue +: cuts.map(_.toLong)) :+ Long.MaxValue
    bounds.sliding(2).zipWithIndex.foreach { case (pair, i) =>
      val (lo, hi) = (pair(0), pair(1))
      val tmp = Files.createTempDirectory(s"graft_chunk$i")
      keyed.filter(col("__ts_split") > lo && col("__ts_split") <= hi)
        .drop("__ts_split")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val src = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .get.toPath
      val dst = ingestDir.resolve(f"events_$i%03d.parquet")
      Files.copy(src, dst)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }

    val work = Files.createTempDirectory("graft_restart")
    val outDir = work.resolve("out").toString
    val ckpt = work.resolve("ckpt").toString

    def start() = {
      val streamEvents = normTs(spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1").parquet(ingestDir.toString))
      EventStreams.tumblingCounts(streamEvents, watermark = "0 seconds")
        .writeStream.format("parquet").partitionBy("event_type")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
    }

    // first run: kill after the first batch commits, mid-stream
    val q1 = start()
    var waited = 0
    while (q1.recentProgress.isEmpty && waited < 60000) { Thread.sleep(100); waited += 100 }
    q1.stop()
    q1.awaitTermination(60000)

    // resume from the same checkpoint to completion
    val q2 = start()
    q2.awaitTermination(120000)

    // the sink manifest must hide any files from the killed attempt: every
    // (window, event_type) key appears exactly once and the emitted rows
    // equal the single-run streaming result
    val got = spark.read.parquet(outDir)
      .select("w_start", "event_type", "n", "sum_value").collect()
    val keys = got.map(r => (r.getLong(0), r.getString(1)))
    assert(keys.nonEmpty, "no output after resume")
    assert(keys.distinct.length == keys.length,
      s"duplicate window keys after restart: ${keys.diff(keys.distinct).take(5).toSeq}")
    val want = EventStreams.tumblingCounts(Tables(spark, TestSpark.sf).events)
      .collect().map(_.mkString("|")).toSet
    val gotSet = got.map(_.mkString("|")).toSet
    assert(gotSet.subsetOf(want), s"rows not in batch twin: ${gotSet -- want}")
    assert(gotSet.size >= (want.size * 95) / 100,
      s"too few windows closed: ${gotSet.size} of ${want.size}")
  }

  test("additive schema drift: pre-drift files null-fill the new column mid-stream") {
    import org.apache.spark.sql.functions._
    val dir = Scratch.dir("graft_drift").toString
    // file 1: legacy schema (no `channel`); file 2: drifted (+ channel) —
    // written second so it arrives in a LATER micro-batch
    Seq((1L, "a"), (2L, "b")).toDF("id", "kind")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((3L, "c", "web"), (4L, "d", "app")).toDF("id", "kind", "channel")
      .coalesce(1).write.mode("append").parquet(dir)
    val widened = spark.read.option("mergeSchema", "true").parquet(dir).schema
    assert(widened.fieldNames.contains("channel"))

    val name = s"drift_${System.nanoTime()}"
    val q = spark.readStream.schema(widened)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val rows = spark.table(name)
      .select($"id", $"kind", $"channel")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    // legacy rows surface with NULL channel, drifted rows carry theirs —
    // unionByName(allowMissingColumns) semantics through the file source
    assert(rows.toSeq == Seq((1L, "a", null), (2L, "b", null),
      (3L, "c", "web"), (4L, "d", "app")))
    // and the run really spanned one file per trigger (no single-batch read)
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
      s"drift did not cross micro-batches: ${q.recentProgress.map(_.numInputRows).toSeq}")
  }
}
