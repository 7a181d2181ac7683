package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.RunningCounts

/** transformWithState end-to-end: per-user ValueState counts accumulate
  * across micro-batches (RocksDB state store). */
class RunningCountsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, user: Long): Ev =
    Ev(id, Timestamp.valueOf("2024-01-01 10:00:00"), user, "click", 1.0, "{}")

  test("per-user running counts accumulate across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[Ev]
      val name = s"rc_${System.nanoTime()}"
      val q = RunningCounts.perUser(mem.toDF()).writeStream
        .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
      try {
        mem.addData(Seq(ev(1, 1), ev(2, 1), ev(3, 2)))
        q.processAllAvailable()
        mem.addData(Seq(ev(4, 1), ev(5, 3)))
        q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: user1=2, user2=1; batch 2: user1=2+1=3 (cumulative), user3=1
      assert(rows == Set((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)), s"got $rows")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
