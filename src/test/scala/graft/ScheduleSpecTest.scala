package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.spec.{ScheduleSpec, Schedules, SpecStore}

/** Unit pins for the schedule planner (c19): JSON parse, anchor alignment
  * (mid-period start rolls forward; weekly rolls to the dow), half-open
  * window semantics, and the empty-window edge. */
class ScheduleSpecTest extends AnyFunSuite {

  test("JSON parse carries every field; keyed store loads") {
    val sp = SpecStore.parseSchedule(
      """{"id": "x", "mapping_id": "m", "every": "1 day", "at": "07:15", "dow": 3}""")
    assert(sp == ScheduleSpec("x", "m", "1 day", Some("07:15"), Some(3)))
  }

  test("sub-daily schedules anchor at the window start, end exclusive") {
    val sp = ScheduleSpec("s", "m", "6 hours")
    val f = Schedules.fires(sp, "2024-01-01 00:00:00", "2024-01-02 00:00:00")
    assert(f == Seq("2024-01-01 00:00:00", "2024-01-01 06:00:00",
                    "2024-01-01 12:00:00", "2024-01-01 18:00:00"))
  }

  test("daily `at` already past the window start rolls one day forward") {
    val sp = ScheduleSpec("s", "m", "1 day", at = Some("03:30"))
    val f = Schedules.fires(sp, "2024-01-01 10:00:00", "2024-01-04 00:00:00")
    assert(f == Seq("2024-01-02 03:30:00", "2024-01-03 03:30:00"))
  }

  test("weekly rolls forward to the requested day-of-week") {
    // 2024-01-02 is a Tuesday; dow 1 = Monday → first fire Jan 8
    val sp = ScheduleSpec("s", "m", "1 week", at = Some("09:00"), dow = Some(1))
    val f = Schedules.fires(sp, "2024-01-02 00:00:00", "2024-01-20 00:00:00")
    assert(f == Seq("2024-01-08 09:00:00", "2024-01-15 09:00:00"))
  }

  test("a window ending before the anchor yields no fires") {
    val sp = ScheduleSpec("s", "m", "1 day", at = Some("23:00"))
    assert(Schedules.fires(sp, "2024-01-01 23:30:00", "2024-01-02 22:00:00").isEmpty)
  }

  test("a dow with no at-time is rejected, not silently ignored") {
    val sp = ScheduleSpec("s", "m", "1 week", dow = Some(1))
    intercept[IllegalArgumentException](
      Schedules.fires(sp, "2024-01-01 00:00:00", "2024-02-01 00:00:00"))
  }
}
