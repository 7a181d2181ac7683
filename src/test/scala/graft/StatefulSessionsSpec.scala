package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{EventStreams, StatefulSessions}

/** The custom-state sessionizer must agree with the built-in session_window
  * operator on closed sessions, and flush open sessions via event-time
  * timeout when the watermark passes. */
class StatefulSessionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ev(id: Long, t: String, user: Long = 1): Ev =
    Ev(id, Timestamp.valueOf(t), user, "click", 1.0, "{}")

  private def run(batches: Seq[Seq[Ev]],
                  f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.Dataset[_]): Set[String] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"ss_out_${System.nanoTime()}"
    val q = f(mem.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(OutputMode.Append()).start()
    try batches.foreach { b => mem.addData(b); q.processAllAvailable() }
    finally q.stop()
    spark.table(name).collect().map(_.mkString("|")).toSet
  }

  // two sessions for user 1 (gap > 30 min), one for user 2; a late driver
  // event pushes the watermark so every session closes
  private val batches = Seq(
    Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:10:00"),
        ev(3, "2024-01-01 10:05:00", user = 2)),
    Seq(ev(4, "2024-01-01 11:30:00")),
    Seq(ev(5, "2024-01-01 15:00:00", user = 9)),
    Seq(ev(6, "2024-01-01 20:00:00", user = 9)))

  test("custom flatMapGroupsWithState sessions == built-in session_window") {
    val custom = run(batches, df => StatefulSessions.sessionize(df))
    val builtin = run(batches, df => {
      import org.apache.spark.sql.functions._
      EventStreams.sessionize(df)
        .select($"user_id", $"start_us", $"end_us", $"n_events")
    })
    // compare on the sessions both emitted (user, start, end, count)
    assert(custom.nonEmpty)
    val users12 = (s: Set[String]) => s.filter(r => r.startsWith("1|") || r.startsWith("2|"))
    assert(users12(custom) == users12(builtin),
      s"custom=${users12(custom)} builtin=${users12(builtin)}")
  }

  test("event-time timeout flushes the open session") {
    val custom = run(batches, df => StatefulSessions.sessionize(df))
    // user 9's 15:00 session closes when 20:00 advances the watermark
    assert(custom.exists(_.startsWith("9|")), s"no flushed session: $custom")
  }
}
