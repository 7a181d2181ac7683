package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.EventStreams

/** Proves the streaming operators compute the SAME results as their batch
  * twins (the oracle-pinned graft.catalog.Events plans) on identical input,
  * and that watermarks actually drop late data — the two properties that make
  * "same logical plan, streaming runner" trustworthy. */
case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double, props: String)

class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, minute: Int, user: Long = 1, typ: String = "click",
                 second: Int = 0): Ev =
    Ev(id, Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$second%02d"), user, typ,
       1.5, s"""{"k": $id}""")

  /** run a streaming transform over a MemoryStream fed with `batches`,
    * complete/append per `mode`, return collected rows as a set of strings. */
  private def runStream(batches: Seq[Seq[Ev]], mode: OutputMode)
                       (f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Set[String] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"es_out_${System.nanoTime()}"
    val q = f(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  private val inOrder: Seq[Ev] = Seq(
    ev(1, 1), ev(2, 5), ev(3, 12, user = 2), ev(4, 14),
    ev(5, 25, typ = "view"), ev(6, 55))

  test("tumblingCounts (streaming, complete) == batch on same input") {
    val got = runStream(Seq(inOrder.take(3), inOrder.drop(3)), OutputMode.Complete())(
      EventStreams.tumblingCounts(_))
    val want = EventStreams.tumblingCounts(inOrder.toDF())
      .collect().map(_.mkString("|")).toSet
    assert(got == want && got.nonEmpty)
  }

  test("slidingCounts (streaming, complete) == batch on same input") {
    val got = runStream(Seq(inOrder), OutputMode.Complete())(EventStreams.slidingCounts(_))
    val want = EventStreams.slidingCounts(inOrder.toDF())
      .collect().map(_.mkString("|")).toSet
    assert(got == want && got.nonEmpty)
  }

  test("slidingCounts in append mode emits exactly the closed windows (e26)") {
    // events at 10:01/10:05/10:12/10:14/10:25, then 10:55 drives the final
    // watermark to 10:45 — every window ending ≤ 10:45 must emit exactly
    // once, and 10:55's two still-open windows (10:50, 10:55) must NOT.
    val got = runStream(Seq(inOrder.take(4), inOrder.drop(4)), OutputMode.Append())(
      EventStreams.slidingCounts(_, watermark = "10 minutes"))
    val batch = EventStreams.slidingCounts(inOrder.toDF())
      .collect().map(_.mkString("|")).toSet
    val wmSec = Timestamp.valueOf("2024-01-01 10:45:00").getTime / 1000
    val want = batch.filter(_.split('|')(0).toLong + 600 <= wmSec)
    assert(got == want, s"got=$got want=$want")
    assert(got.size < batch.size, "eviction never withheld an open window")
  }

  test("sessionize closes a session after the gap (append mode emits it)") {
    // user 1: events at 10:01 and 10:05 (one session), then 11:30 (new
    // session) pushes the watermark far past the first session's close.
    val got = runStream(
      Seq(Seq(ev(1, 1), ev(2, 5)), Seq(Ev(9, Timestamp.valueOf("2024-01-01 11:30:00"), 1, "click", 1.5, "{}"))),
      OutputMode.Append())(EventStreams.sessionize(_))
    // first session: 10:01..(10:05+30min gap) = start 10:01:00, end 10:35:00
    val first = got.find(_.startsWith("1|"))
    assert(first.isDefined, s"no closed session emitted: $got")
    assert(first.get == s"1|${Timestamp.valueOf("2024-01-01 10:01:00").getTime * 1000}|" +
      s"${Timestamp.valueOf("2024-01-01 10:35:00").getTime * 1000}|2")
  }

  test("watermark drops late data in append-mode tumbling aggregation") {
    // batch 1 advances event time to 11:00 (watermark 10 min → 10:50);
    // batch 2 adds a LATE event at 10:02 — its 10:00 window is already
    // finalized, so the late event must NOT appear in the output counts.
    val onTime = Seq(ev(1, 1), Ev(2, Timestamp.valueOf("2024-01-01 11:00:00"), 1, "click", 1.5, "{}"))
    val late = Seq(ev(99, 2)) // 10:02, behind the 10:50 watermark
    val got = runStream(Seq(onTime, late, Seq(Ev(3, Timestamp.valueOf("2024-01-01 12:00:00"), 1, "click", 1.5, "{}"))),
      OutputMode.Append())(EventStreams.tumblingCounts(_, watermark = "10 minutes"))
    // the 10:00 window must report n=1 (only event_id 1), never n=2
    val w1000 = got.filter(_.startsWith(s"${Timestamp.valueOf("2024-01-01 10:00:00").getTime / 1000}|"))
    assert(w1000.exists(_.contains("|1|")), s"10:00 window missing or wrong: $got")
    assert(!w1000.exists(_.contains("|2|")), s"late event was counted: $got")
  }

  test("dedupEvents drops within-watermark duplicate event_ids") {
    val got = runStream(
      Seq(Seq(ev(1, 1), ev(1, 1), ev(2, 5)), Seq(ev(2, 5), ev(3, 8))),
      OutputMode.Append())(EventStreams.dedupEvents(_))
    assert(got.size == 3, s"expected 3 unique events, got: $got")
  }

  test("stream-stream interval join == batch join on same input") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = Seq(ev(1, 10), ev(2, 30), ev(3, 50, user = 2))
    val errors = Seq(ev(11, 5, typ = "error"), ev(12, 28, typ = "error"),
                     ev(13, 45, typ = "error", user = 2), ev(14, 20, typ = "error", user = 3))
    val memC = MemoryStream[Ev]
    val memE = MemoryStream[Ev]
    val name = s"ssj_${System.nanoTime()}"
    val q = EventStreams.clickErrorJoin(memC.toDF(), memE.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      memC.addData(clicks.take(2)); memE.addData(errors.take(2)); q.processAllAvailable()
      memC.addData(clicks.drop(2)); memE.addData(errors.drop(2)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table(name).collect().map(_.mkString("|")).toSet
    val want = EventStreams.clickErrorJoin(clicks.toDF(), errors.toDF())
      .collect().map(_.mkString("|")).toSet
    assert(got == want && got.nonEmpty, s"got=$got want=$want")
  }

  test("left-outer interval join emits unmatched clicks once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memE = MemoryStream[Ev]
    val name = s"ssjl_${System.nanoTime()}"
    val q = EventStreams.clickErrorJoinLeft(memC.toDF(), memE.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // c1 (10:10) matches e11 (10:05); c2 (10:30) has no error in window
      memC.addData(Seq(ev(1, 10), ev(2, 30)))
      memE.addData(Seq(ev(11, 5, typ = "error")))
      q.processAllAvailable()
      // advance BOTH sides' watermarks far past c2's interval (13:00 − 30min
      // ≫ 10:30) so c2's state is evicted and its null row emitted; the two
      // 13:00 events match each other
      memC.addData(Seq(Ev(3, Timestamp.valueOf("2024-01-01 13:00:00"), 7, "click", 1.5, "{}")))
      memE.addData(Seq(Ev(12, Timestamp.valueOf("2024-01-01 13:00:00"), 7, "error", 1.5, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    val matched = rows.filter(!_.isNullAt(3)).map(r => (r.getLong(0), r.getLong(3))).toSet
    val nullClicks = rows.filter(_.isNullAt(3)).map(_.getLong(0)).toSet
    assert(matched == Set((1L, 11L), (3L, 12L)), s"matched=$matched")
    assert(nullClicks == Set(2L), s"null-extended=$nullClicks")
  }

  test("full-outer interval join evicts BOTH sides: unmatched clicks AND errors surface") {
    implicit val sqlCtx = spark.sqlContext
    val memC = MemoryStream[Ev]
    val memE = MemoryStream[Ev]
    val name = s"ssjf_${System.nanoTime()}"
    val q = EventStreams.clickErrorJoinFull(memC.toDF(), memE.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append()).start()
    try {
      // c1 (10:10) matches e11 (10:05); c2 (10:30) never matches; e14
      // (10:20, user 3) has no click in [10:20, 10:30] — both must
      // null-extend after eviction, from OPPOSITE sides of the join
      memC.addData(Seq(ev(1, 10), ev(2, 30)))
      memE.addData(Seq(ev(11, 5, typ = "error"), ev(14, 20, typ = "error", user = 3)))
      q.processAllAvailable()
      // 13:00 on both sides pushes the global watermark past every
      // eviction bound (c2 at 10:30; e14 at 10:20 + 10 min)
      memC.addData(Seq(Ev(3, Timestamp.valueOf("2024-01-01 13:00:00"), 7, "click", 1.5, "{}")))
      memE.addData(Seq(Ev(12, Timestamp.valueOf("2024-01-01 13:00:00"), 7, "error", 1.5, "{}")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table(name).collect()
    val matched = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(3))
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    val nullClicks = rows.filter(r => !r.isNullAt(0) && r.isNullAt(3)).map(_.getLong(0)).toSet
    val nullErrors = rows.filter(r => r.isNullAt(0) && !r.isNullAt(3)).map(_.getLong(3)).toSet
    assert(matched == Set((1L, 11L), (3L, 12L)), s"matched=$matched")
    assert(nullClicks == Set(2L), s"null-extended clicks=$nullClicks")
    assert(nullErrors == Set(14L), s"null-extended errors=$nullErrors")
    // user_id must come from the SURVIVING side on every row
    rows.foreach(r => assert(!r.isNullAt(1), s"null user_id in $r"))
  }

  test("parseProps extracts k identically in batch") {
    val out = EventStreams.parseProps(inOrder.toDF()).select($"event_id", $"k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 6L))
  }

  test("e32: qualifying-conversion semantics on a planted fixture") {
    // user 1 converts 2 days after first view; user 2's only qualifying
    // purchase PRECEDES their first view (must not count — the at-or-after
    // contract); user 3's later purchase is below the value qualifier.
    val day = 86400000000L
    def ts(us: Long) = new java.sql.Timestamp(us / 1000)
    val rows = Seq(
      (1L, ts(10L * day), 1L, "view", 0.0, "{}"),
      (2L, ts(12L * day), 1L, "purchase", 150.0, "{}"),
      (3L, ts(9L * day), 2L, "purchase", 200.0, "{}"),
      (4L, ts(10L * day), 2L, "view", 0.0, "{}"),
      (5L, ts(10L * day), 3L, "view", 0.0, "{}"),
      (6L, ts(11L * day), 3L, "purchase", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = graft.Scratch.dir("e32fix").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("e32_stream_conversion_lag")(spark, dir)
      .collect()
    assert(out.length == 1, s"expected exactly one latency bucket: ${out.toSeq}")
    assert(out.head.getAs[Long]("latency_days") == 2L)
    assert(out.head.getAs[Long]("n_users") == 1L)
    assert(out.head.getAs[Long]("cum_bp") == 10000L)
  }
}
