package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.VectorMap

/** k31 — the paginated REST source (sources/RestTable over
  * http.PagedJsonApi): partition-per-page batch reads, column pruning,
  * and the page-number streaming offset's resume contract (kill between
  * pages → restart delivers each committed page exactly once). */
class RestSourceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def row(k: Long, v: String, x: Double): Map[String, Any] =
    VectorMap[String, Any]("k" -> k, "v" -> v, "x" -> x)

  private val ddl = "k BIGINT, v STRING, x DOUBLE"

  test("k31: batch read = one partition per page, values and types intact") {
    val rows = (1L to 10L).map(i => row(i, s"name_$i", i * 1.5))
    val api = new graft.http.PagedJsonApi(rows, pageSize = 3).start()
    try {
      val df = spark.read.format("graft.sources.RestTable")
        .option("url", api.url).option("schema", ddl).load()
      assert(df.rdd.getNumPartitions == 4) // ceil(10/3)
      val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(got == (1L to 10L).map(i => (i, s"name_$i", i * 1.5)))
    } finally api.stop()
  }

  test("k31: column pruning reaches the scan; missing/null JSON fields -> null") {
    val rows = IndexedSeq(
      VectorMap[String, Any]("k" -> 1L, "v" -> "a", "x" -> 2.5),
      VectorMap[String, Any]("k" -> 2L, "v" -> null, "x" -> null), // nulls
      VectorMap[String, Any]("k" -> 3L))                           // absent
    val api = new graft.http.PagedJsonApi(rows, pageSize = 10).start()
    try {
      val df = spark.read.format("graft.sources.RestTable")
        .option("url", api.url).option("schema", ddl).load()
      val pruned = df.select($"k")
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.matches("(?s).*ReadSchema: \\[k\\].*"), plan)
      val full = df.orderBy($"k").collect()
      assert(full(1).isNullAt(1) && full(1).isNullAt(2))
      assert(full(2).isNullAt(1) && full(2).isNullAt(2))
    } finally api.stop()
  }

  test("k31: streaming resumes from the page offset — kill between pages, no dup, no gap") {
    import org.apache.spark.sql.streaming.Trigger
    val first = (1L to 6L).map(i => row(i, s"n$i", i.toDouble))
    val api = new graft.http.PagedJsonApi(first, pageSize = 3).start()
    try {
      val ckpt = Scratch.dir("restckpt").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      def drain(): Unit = {
        val q = spark.readStream.format("graft.sources.RestTable")
          .option("url", api.url).option("schema", ddl).load()
          .writeStream.outputMode("append").option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.select($"k").collect().foreach(r => seen.add(r.getLong(0))); ()
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      drain() // consumes pages 0..1 (admission control: 1 page per trigger)
      assert(seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq ==
        (1L to 6L), seen.toString)
      seen.clear()
      // the endpoint grows by two pages while the stream is DOWN
      api.append((7L to 12L).map(i => row(i, s"n$i", i.toDouble)))
      drain() // restart from the checkpointed page count
      val second = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted.toSeq
      assert(second == (7L to 12L),
        s"resume re-delivered or skipped pages: $second")
    } finally api.stop()
  }

  test("k31: a mid-drain failure re-delivers only the uncommitted page") {
    import org.apache.spark.sql.streaming.Trigger
    val rows = (1L to 9L).map(i => row(i, s"n$i", i.toDouble))
    val api = new graft.http.PagedJsonApi(rows, pageSize = 3).start()
    try {
      val ckpt = Scratch.dir("restkill").toString
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val fail = new java.util.concurrent.atomic.AtomicBoolean(true)
      def drain(failSecond: Boolean): Unit = {
        val q = spark.readStream.format("graft.sources.RestTable")
          .option("url", api.url).option("schema", ddl).load()
          .writeStream.outputMode("append").option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            val ks = b.select($"k").collect().map(_.getLong(0))
            // the "kill": die before committing the second batch
            if (failSecond && ks.nonEmpty && ks.min > 3 && fail.getAndSet(false))
              sys.error("simulated crash between pages")
            ks.foreach(seen.add); ()
          }
          .trigger(Trigger.AvailableNow()).start()
        try q.awaitTermination()
        catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      }
      drain(failSecond = true)  // page 0 committed; crash on page 1
      drain(failSecond = false) // resumes AT page 1 (uncommitted), then 2
      val got = seen.toArray(Array.empty[java.lang.Long]).map(_.toLong).toSeq
      // every row exactly once: page 0 was NOT re-delivered after restart
      assert(got.sorted == (1L to 9L), s"delivery was not exactly-once: $got")
    } finally api.stop()
  }
}
