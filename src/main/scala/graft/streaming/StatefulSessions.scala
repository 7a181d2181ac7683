package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user open session carried between micro-batches. */
final case class OpenSession(start_us: Long, last_us: Long, n_events: Long)

/** A finalized session (same shape as EventStreams.sessionize output). */
final case class SessionOut(user_id: Long, start_us: Long, end_us: Long, n_events: Long)

/** Custom streaming state via flatMapGroupsWithState — the escape hatch for
  * session semantics the built-in `session_window` can't express (e.g.
  * per-user dynamic gaps, session caps, custom close conditions). This
  * implementation reproduces fixed-gap sessions so StatefulSessionsSpec can
  * pin it against the built-in operator; the structure (state class, event
  * sort, gap fold, event-time timeout for the final flush) is what a custom
  * policy would extend.
  *
  * Scale notes: state is per-user and bounded to ONE open session (a few
  * dozen bytes); event-time timeout + watermark evict users whose session
  * closed — state size tracks active users, not history. Batches sort only
  * the group's new events.
  */
object StatefulSessions {

  /** events(user_id, ts) stream → closed sessions (append-mode output).
    * End timestamp convention matches session_window: end = last + gap. */
  def sessionize(events: Dataset[org.apache.spark.sql.Row],
                 gapMinutes: Int = 30,
                 watermark: String = "30 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000000

    val keyed = events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("ts"))
      .as[(Long, Timestamp)]
      .groupByKey(_._1)

    keyed.flatMapGroupsWithState[OpenSession, SessionOut](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      case (user: Long, rows: Iterator[(Long, Timestamp)], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          // watermark passed last+gap: the open session is final
          val s = state.get
          state.remove()
          Iterator.single(SessionOut(user, s.start_us, s.last_us + gapUs, s.n_events))
        } else {
          // full microsecond precision: getTime is ms-truncated, the
          // sub-second part lives in getNanos
          val times = rows.map { r =>
            r._2.getTime / 1000 * 1000000L + r._2.getNanos / 1000
          }.toArray.sorted
          var open = state.getOption
          val closed = Iterator.newBuilder[SessionOut]
          times.foreach { us =>
            open match {
              case Some(s) if us - s.last_us > gapUs =>
                closed += SessionOut(user, s.start_us, s.last_us + gapUs, s.n_events)
                open = Some(OpenSession(us, us, 1))
              case Some(s) =>
                open = Some(s.copy(last_us = math.max(s.last_us, us), n_events = s.n_events + 1))
              case None =>
                open = Some(OpenSession(us, us, 1))
            }
          }
          open.foreach { s =>
            state.update(s)
            // flush the open session once the watermark passes last + gap
            state.setTimeoutTimestamp((s.last_us + gapUs) / 1000)
          }
          closed.result()
        }
    }(Encoders.product[OpenSession], Encoders.product[SessionOut])
  }
}
