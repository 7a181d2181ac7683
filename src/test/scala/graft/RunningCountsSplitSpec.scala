package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RunningCounts

/** e7's batch-split-independence claim, exercised with a REAL file source
  * forced into multiple micro-batches (maxFilesPerTrigger=1): per-user
  * transformWithState counts accumulate across batches in RocksDB state,
  * and max(n_events) per user equals the batch-mode count regardless of
  * how the files split. */
class RunningCountsSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("transformWithState totals are identical under 1-file-per-batch splits") {
    import spark.implicits._
    val src = Tables(spark, "/root/testdata/sf0.001").events
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
    val dir = Files.createTempDirectory("rcsplit").toString
    // two physical files → two micro-batches at maxFilesPerTrigger=1
    src.filter($"event_id" % 2 === 0).coalesce(1)
      .write.mode("append").parquet(s"$dir/events")
    src.filter($"event_id" % 2 === 1).coalesce(1)
      .write.mode("append").parquet(s"$dir/events")

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val st = spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(s"$dir/events")
      val name = s"rcs_${System.nanoTime()}"
      val q = RunningCounts.perUser(st).writeStream
        .format("memory").queryName(name)
        .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val streamed = spark.table(name)
        .groupBy($"user_id").agg(max($"n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = src.groupBy($"user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed == batch)
      // multiple batches really happened: some user emitted more than once
      val emissions = spark.table(name).groupBy($"user_id").count()
        .agg(max("count")).head().getLong(0)
      assert(emissions > 1, "expected per-user emissions from more than one batch")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
