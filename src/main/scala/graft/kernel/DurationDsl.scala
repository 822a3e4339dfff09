package graft.kernel

/** Polars duration-string DSL parser (reference: lib/polars/lazy_frame.rb:1198-1219):
  * `"3d12h"`, `"1mo"`, `"1y"`, `"90s"`, `"1i"` (index count), units
  * ns/us/ms/s/m/h/d/w/mo/q/y/i. Used by group_by_dynamic / rolling_by /
  * join_asof tolerance / dt.offset_by / upsample.
  */
final case class Duration(
    months: Long = 0, weeks: Long = 0, days: Long = 0, nanos: Long = 0,
    indexCount: Long = 0) {
  def totalNanos: Long = {
    require(months == 0, "calendar months have no fixed nanosecond length")
    (weeks * 7 + days) * 86400L * 1000000000L + nanos
  }
  def totalMicros: Long = totalNanos / 1000
  def totalSeconds: Double = totalNanos / 1e9
  def isCalendar: Boolean = months != 0
  /** Calendar months only — no fixed-length or index component mixed in.
    * Calendar bucket arithmetic (group_by_dynamic / rolling / dt.round over
    * mo/q/y) is only well-defined for pure month strides. */
  def isPureCalendar: Boolean =
    months != 0 && weeks == 0 && days == 0 && nanos == 0 && indexCount == 0
  /** Spark SQL interval literal string, e.g. "INTERVAL '3' DAY" — pure
    * durations only (ANSI interval literals cannot mix year-month and
    * day-time fields); mixed durations go through [[intervalCol]]. */
  def sqlInterval: String =
    if (months != 0) {
      require(weeks == 0 && days == 0 && nanos == 0,
        "mixed calendar+fixed duration has no ANSI interval literal; use intervalCol")
      s"INTERVAL '$months' MONTH"
    } else s"INTERVAL '${totalMicros}' MICROSECOND"

  /** Column form of the step, usable by `sequence`/datetime arithmetic for
    * ANY duration: mixed calendar+fixed ("1mo2d") builds a
    * CalendarIntervalType via make_interval — previously the fixed part
    * was silently dropped by the month-only literal. */
  def intervalCol: org.apache.spark.sql.Column = {
    import org.apache.spark.sql.{functions => F}
    if (months != 0 && (weeks != 0 || days != 0 || nanos != 0))
      F.make_interval(F.lit(0), F.lit(months.toInt), F.lit(0),
        F.lit((weeks * 7 + days).toInt), F.lit(0), F.lit(0),
        F.lit(new java.math.BigDecimal(nanos).movePointLeft(9)))
    else F.expr(sqlInterval)
  }
}

object DurationDsl {
  private val token = "([0-9]+)(ns|us|ms|mo|s|m|h|d|w|q|y|i)".r

  def parse(s: String): Duration = {
    val str0 = s.trim.toLowerCase.replace(" ", "")
    require(str0.nonEmpty, "empty duration")
    // a leading '-' negates the WHOLE duration (polars: offset_by("-1mo2d"))
    val neg = str0.startsWith("-")
    val str = if (neg) str0.substring(1) else str0
    require(str.nonEmpty, "empty duration")
    var d = Duration()
    var matchedLen = 0
    for (m <- token.findAllMatchIn(str)) {
      matchedLen += m.matched.length
      val n = m.group(1).toLong
      d = m.group(2) match {
        case "ns" => d.copy(nanos = d.nanos + n)
        case "us" => d.copy(nanos = d.nanos + n * 1000L)
        case "ms" => d.copy(nanos = d.nanos + n * 1000000L)
        case "s"  => d.copy(nanos = d.nanos + n * 1000000000L)
        case "m"  => d.copy(nanos = d.nanos + n * 60L * 1000000000L)
        case "h"  => d.copy(nanos = d.nanos + n * 3600L * 1000000000L)
        case "d"  => d.copy(days = d.days + n)
        case "w"  => d.copy(weeks = d.weeks + n)
        case "mo" => d.copy(months = d.months + n)
        case "q"  => d.copy(months = d.months + 3 * n)
        case "y"  => d.copy(months = d.months + 12 * n)
        case "i"  => d.copy(indexCount = d.indexCount + n)
      }
    }
    require(matchedLen == str.length, s"cannot parse duration: '$s'")
    if (neg) Duration(-d.months, -d.weeks, -d.days, -d.nanos, -d.indexCount) else d
  }
}
