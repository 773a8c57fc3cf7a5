package graft.core

/** Parse the reference's batch-interval strings — `"10d"`, `"3months"`,
  * `"1 hour"` … — into a calendar-aware interval (reference:
  * `dataset/writer.py:300-334`: regex digit/letter split + unit table).
  *
  * Calendar units (month/year) don't have fixed micro lengths, so the
  * result keeps (months, micros) separately, exactly like Spark's
  * `CalendarInterval`.
  */
object IntervalParse {
  final case class Interval(months: Int, micros: Long) {
    def isCalendar: Boolean = months != 0
    /** Spark SQL interval literal body, e.g. "INTERVAL 10 DAY". */
    def sql: String =
      if (months != 0) s"INTERVAL $months MONTH"
      else if (micros % 86400000000L == 0) s"INTERVAL ${micros / 86400000000L} DAY"
      else if (micros % 3600000000L == 0) s"INTERVAL ${micros / 3600000000L} HOUR"
      else if (micros % 60000000L == 0) s"INTERVAL ${micros / 60000000L} MINUTE"
      else if (micros % 1000000L == 0) s"INTERVAL ${micros / 1000000L} SECOND"
      // sub-second intervals (the parser accepts ms/us) render as a
      // fractional-second literal — integer division here would
      // silently truncate 500ms to INTERVAL 0 SECOND
      else s"INTERVAL '${micros / 1000000L}.${f"${micros % 1000000L}%06d"}' SECOND"
  }

  private val Pattern = """^\s*(\d+)\s*([a-zA-Z]+)\s*$""".r

  private val MICRO: Map[String, Long] = Map(
    "us" -> 1L, "microsecond" -> 1L, "microseconds" -> 1L,
    "ms" -> 1000L, "millisecond" -> 1000L, "milliseconds" -> 1000L,
    "s" -> 1000000L, "sec" -> 1000000L, "second" -> 1000000L, "seconds" -> 1000000L,
    "min" -> 60000000L, "minute" -> 60000000L, "minutes" -> 60000000L,
    "h" -> 3600000000L, "hour" -> 3600000000L, "hours" -> 3600000000L,
    "d" -> 86400000000L, "day" -> 86400000000L, "days" -> 86400000000L,
    "w" -> 604800000000L, "week" -> 604800000000L, "weeks" -> 604800000000L)

  private val MONTHS: Map[String, Int] = Map(
    "mo" -> 1, "month" -> 1, "months" -> 1,
    "y" -> 12, "a" -> 12, "year" -> 12, "years" -> 12)

  def parse(s: String): Interval = s match {
    case Pattern(n, unit) =>
      val u = unit.toLowerCase
      MONTHS.get(u).map(m => Interval(n.toInt * m, 0L))
        .orElse(MICRO.get(u).map(us => Interval(0, n.toLong * us)))
        .getOrElse(throw new IllegalArgumentException(s"unknown interval unit: $unit"))
    case _ => throw new IllegalArgumentException(s"cannot parse interval: '$s'")
  }
}
