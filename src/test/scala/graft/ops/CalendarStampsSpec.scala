package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.types.Frequency

/** Unit coverage for the calendar-frequency stamp generators behind
  * fill_gaps / fill_forward (monthly path is oracle-verified end-to-end;
  * these pin the quarterly/yearly arithmetic, gaps.rs:184-259 semantics:
  * inserted stamps are period STARTS between observations). */
class CalendarStampsSpec extends AnyFunSuite {

  private def micros(date: String): Long =
    java.time.LocalDate.parse(date).atStartOfDay.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L

  private def dates(stamps: Array[Long]): Seq[String] =
    stamps.map(m => java.time.LocalDateTime
      .ofEpochSecond(m / 1000000L, 0, java.time.ZoneOffset.UTC).toLocalDate.toString).toSeq

  test("monthly gap stamps are month starts between observations") {
    val out = TsPrep.calendarGapStamps(micros("2024-01-15"), micros("2024-05-20"),
      Frequency.parse("1mo"))
    assert(dates(out) == Seq("2024-02-01", "2024-03-01", "2024-04-01"))
  }

  test("quarterly gap stamps are quarter starts") {
    val out = TsPrep.calendarGapStamps(micros("2023-02-10"), micros("2024-01-05"),
      Frequency.parse("1q"))
    assert(dates(out) == Seq("2023-04-01", "2023-07-01", "2023-10-01"))
  }

  test("yearly gap stamps are year starts") {
    val out = TsPrep.calendarGapStamps(micros("2020-06-15"), micros("2024-03-01"),
      Frequency.parse("1y"))
    assert(dates(out) == Seq("2021-01-01", "2022-01-01", "2023-01-01"))
  }

  test("adjacent periods produce no stamps") {
    assert(TsPrep.calendarGapStamps(micros("2024-01-31"), micros("2024-02-01"),
      Frequency.parse("1mo")).isEmpty)
    assert(TsPrep.calendarGapStamps(micros("2023-11-01"), micros("2024-02-01"),
      Frequency.parse("1q")).isEmpty)
  }

  test("forward stamps advance from the observation's period start") {
    val q = Frequency.parse("1q")
    assert(dates(Array(TsPrep.calendarForwardStamp(micros("2024-02-10"), 1, q))) ==
      Seq("2024-04-01"))
    assert(dates(Array(TsPrep.calendarForwardStamp(micros("2024-02-10"), 2, q))) ==
      Seq("2024-07-01"))
    val y = Frequency.parse("1y")
    assert(dates(Array(TsPrep.calendarForwardStamp(micros("2024-06-15"), 1, y))) ==
      Seq("2025-01-01"))
  }
}
