package graft.spec

import java.time.{Duration, LocalDateTime}
import java.time.format.DateTimeFormatter

/** Deterministic fire-time derivation for ScheduleSpec (reference
  * ROADMAP.md:48 "Scheduled/automated conversions"): given a schedule and a
  * half-open UTC window [start, end), compute the exact fire instants — the
  * pure function an orchestrator's "what is due" planner needs. No clocks
  * anywhere: alignment and stepping are arithmetic over the window bounds,
  * so the same spec + window yields the same plan on every engine (c19's
  * oracle replays it in SQL).
  *
  * Alignment: the anchor is the FIRST fire ≥ start — sub-daily steps anchor
  * at the window start itself; daily steps align to `at` (HH:MM) within the
  * start's day (rolling one day forward if already past); weekly steps
  * additionally roll forward to `dow` (1 = Monday). Catch-up collapse (c19)
  * is downstream policy: of the fires in (last_run, now], run ONCE at the
  * latest — re-running every missed slot is the classic scheduler bug at
  * scale (a day-long outage must not replay 240 six-hour conversions).
  */
object Schedules {
  private val Fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  private def stepOf(every: String): Duration = {
    val Array(n, unit) = every.trim.split("\\s+")
    unit.toLowerCase.stripSuffix("s") match {
      case "hour" => Duration.ofHours(n.toLong)
      case "day"  => Duration.ofDays(n.toLong)
      case "week" => Duration.ofDays(7L * n.toLong)
      case other  => throw new IllegalArgumentException(s"unknown unit: $other")
    }
  }

  /** first fire ≥ start for this spec's alignment. */
  private[spec] def anchor(sp: ScheduleSpec, start: LocalDateTime): LocalDateTime = {
    val at = sp.at.map { s =>
      val Array(h, m) = s.split(":"); (h.toInt, m.toInt)
    }
    at match {
      case None =>
        // a dow with no at-time has no defined alignment — reject rather
        // than silently ignoring the field
        require(sp.dow.isEmpty,
          s"schedule ${sp.id}: dow requires an 'at' time")
        start
      case Some((h, m)) =>
        var a = start.toLocalDate.atTime(h, m)
        if (a.isBefore(start)) a = a.plusDays(1)
        sp.dow.foreach { d =>
          while (a.getDayOfWeek.getValue != d) a = a.plusDays(1)
        }
        a
    }
  }

  /** all fires in [start, end), as formatted UTC strings (empty if none). */
  def fires(sp: ScheduleSpec, start: String, end: String): Seq[String] = {
    val s = LocalDateTime.parse(start, Fmt)
    val e = LocalDateTime.parse(end, Fmt)
    val step = stepOf(sp.every)
    val a = anchor(sp, s)
    Iterator.iterate(a)(_.plus(step))
      .takeWhile(_.isBefore(e))
      .map(_.format(Fmt))
      .toSeq
  }
}
