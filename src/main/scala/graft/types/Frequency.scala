package graft.types

import java.time.{Instant, LocalDateTime, ZoneOffset}

/** Frequency grammar + calendar arithmetic.
  *
  * Grammar matches the reference (docs/api/22-supported-frequencies.md:20-68,
  * parser contract src/include/ts_fill_gaps_native.hpp:20-28): Polars style
  * (`1d`, `1h`, `30m`, `1w`, `1mo`, `1q`, `1y`, `15s`, `10ms`, `5us`),
  * DuckDB INTERVAL style (`1 day`, `7 days`, `1 month`, ...) and raw
  * integers (interpreted as days for date/timestamp columns, raw steps for
  * integer date columns).
  *
  * Calendar frequencies (month/quarter/year) do calendar-aware rollover with
  * end-of-month day clamping (reference: ts_forecast_native.cpp:674-728,
  * gaps.rs:146-259): Jan 31 + 1mo = Feb 28/29.
  */
sealed trait FreqType
object FreqType {
  case object Fixed extends FreqType
  case object Monthly extends FreqType
  case object Quarterly extends FreqType
  case object Yearly extends FreqType
}

final case class Frequency(tpe: FreqType, n: Long, micros: Long, isRaw: Boolean) {

  /** Raw-integer frequencies mean "n days" on date/timestamp columns but
    * "n raw steps" on integer date columns (ParsedFrequency.is_raw contract,
    * ts_fill_gaps_native.hpp:20-24). */
  def forIntegerDs(isIntegerDs: Boolean): Frequency =
    if (isRaw && isIntegerDs) copy(micros = n) else this

  /** Date of `base + step * this`, in epoch micros (UTC). */
  def advance(baseMicros: Long, step: Long): Long = tpe match {
    case FreqType.Fixed => baseMicros + step * micros
    case FreqType.Monthly => Frequency.addMonths(baseMicros, n * step)
    case FreqType.Quarterly => Frequency.addMonths(baseMicros, 3L * n * step)
    case FreqType.Yearly => Frequency.addMonths(baseMicros, 12L * n * step)
  }

  /** Number of whole steps between two instants (grid position distance).
    * For calendar frequencies this counts month boundaries. */
  def stepsBetween(fromMicros: Long, toMicros: Long): Long = tpe match {
    case FreqType.Fixed => (toMicros - fromMicros) / micros
    case _ =>
      val a = LocalDateTime.ofInstant(Instant.ofEpochSecond(fromMicros / 1000000L,
        (fromMicros % 1000000L) * 1000L), ZoneOffset.UTC)
      val b = LocalDateTime.ofInstant(Instant.ofEpochSecond(toMicros / 1000000L,
        (toMicros % 1000000L) * 1000L), ZoneOffset.UTC)
      val months = (b.getYear - a.getYear) * 12L + (b.getMonthValue - a.getMonthValue)
      val per = tpe match {
        case FreqType.Monthly => n
        case FreqType.Quarterly => 3L * n
        case FreqType.Yearly => 12L * n
        case FreqType.Fixed => 1L
      }
      months / per
  }
}

object Frequency {
  private val MicrosPerSecond = 1000000L
  private val MicrosPerMinute = 60L * MicrosPerSecond
  private val MicrosPerHour = 60L * MicrosPerMinute
  private val MicrosPerDay = 24L * MicrosPerHour
  private val MicrosPerWeek = 7L * MicrosPerDay

  private val polars = "^(\\d+)(us|ms|s|m|h|d|w|mo|q|y)$".r
  private val interval =
    "^(\\d+)\\s+(microsecond|millisecond|second|minute|hour|day|week|month|quarter|year)s?$".r
  private val rawInt = "^(\\d+)$".r

  def parse(s: String): Frequency = {
    val t = s.trim.toLowerCase
    t match {
      case polars(num, unit) => fromUnit(num.toLong, unit, isRaw = false)
      case interval(num, unit) =>
        val u = unit match {
          case "microsecond" => "us"; case "millisecond" => "ms"
          case "second" => "s"; case "minute" => "m"; case "hour" => "h"
          case "day" => "d"; case "week" => "w"; case "month" => "mo"
          case "quarter" => "q"; case "year" => "y"
        }
        fromUnit(num.toLong, u, isRaw = false)
      case rawInt(num) =>
        // raw integer: days for date/timestamp columns; raw steps for int cols
        Frequency(FreqType.Fixed, num.toLong, num.toLong * MicrosPerDay, isRaw = true)
      case _ =>
        throw new IllegalArgumentException(
          s"Invalid frequency '$s'. Expected Polars style (1d, 1h, 30m, 1w, 1mo, 1q, 1y), " +
            "INTERVAL style ('1 day', '1 month'), or a raw integer.")
    }
  }

  private def fromUnit(n: Long, unit: String, isRaw: Boolean): Frequency = {
    require(n > 0, s"frequency multiplier must be positive, got $n")
    unit match {
      case "us" => Frequency(FreqType.Fixed, n, n, isRaw)
      case "ms" => Frequency(FreqType.Fixed, n, n * 1000L, isRaw)
      case "s" => Frequency(FreqType.Fixed, n, n * MicrosPerSecond, isRaw)
      case "m" => Frequency(FreqType.Fixed, n, n * MicrosPerMinute, isRaw)
      case "h" => Frequency(FreqType.Fixed, n, n * MicrosPerHour, isRaw)
      case "d" => Frequency(FreqType.Fixed, n, n * MicrosPerDay, isRaw)
      case "w" => Frequency(FreqType.Fixed, n, n * MicrosPerWeek, isRaw)
      case "mo" => Frequency(FreqType.Monthly, n, 0L, isRaw)
      case "q" => Frequency(FreqType.Quarterly, n, 0L, isRaw)
      case "y" => Frequency(FreqType.Yearly, n, 0L, isRaw)
    }
  }

  /** Calendar month addition with day-of-month clamping, UTC.
    * Keeps the time-of-day component untouched. */
  def addMonths(baseMicros: Long, months: Long): Long = {
    val secs = Math.floorDiv(baseMicros, MicrosPerSecond)
    val microFrac = Math.floorMod(baseMicros, MicrosPerSecond)
    val ldt = LocalDateTime.ofEpochSecond(secs, (microFrac * 1000L).toInt, ZoneOffset.UTC)
    val out = ldt.plusMonths(months) // java.time clamps day-of-month
    out.toEpochSecond(ZoneOffset.UTC) * MicrosPerSecond + out.getNano / 1000L
  }

  /** Grid of `count` future dates strictly after `lastMicros`. */
  def futureDates(f: Frequency, lastMicros: Long, count: Int): Array[Long] =
    Array.tabulate(count)(i => f.advance(lastMicros, i + 1L))
}
