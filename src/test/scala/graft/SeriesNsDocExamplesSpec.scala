package graft

import java.sql.{Date, Timestamp}
import graft.api.Series
import graft.testing.Testing

/** Series-namespace slice of the reference `@example` golden corpus
  * (date_time_name_space.rb / string_name_space.rb / list_name_space.rb
  * docstrings). Expected strings are verbatim renders, same rules as
  * SeriesDocExamplesSpec. Porting notes:
  *  - the reference builds inputs with date_range/datetime_range(eager:);
  *    here the equivalent explicit Date/Timestamp seqs are used.
  *  - durations are i64 µs ticks (SURVEY §1.2), so the total_* chains spell
  *    the datetime→duration step as .dt.epoch("us").diff explicitly where
  *    the reference's typed engine does it inside Series#diff.
  *  - u32-typed examples (str.lengths / list.lengths headers) stay excluded
  *    per the corpus rule (Spark has no unsigned ints).
  */
class SeriesNsDocExamplesSpec extends SparkSpec {
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(s: Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  private def d(s: String): Date = Date.valueOf(s)
  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- date_time_name_space.rb ----

  test("dt.year over a date series is i32") {
    val s = Series("date", Seq(d("2001-01-01"), d("2002-01-01")))
    check(s.dt.year,
      "shape: (2,)\nSeries: 'date' [i32]\n[\n\t2001\n\t2002\n]")
  }

  test("dt.quarter and dt.month over a monthly range are i8") {
    val s = Series("date", Seq(d("2001-01-01"), d("2001-02-01"), d("2001-03-01"), d("2001-04-01")))
    check(s.dt.quarter,
      "shape: (4,)\nSeries: 'date' [i8]\n[\n\t1\n\t1\n\t1\n\t2\n]")
    check(s.dt.month,
      "shape: (4,)\nSeries: 'date' [i8]\n[\n\t1\n\t2\n\t3\n\t4\n]")
  }

  test("dt.week of month starts") {
    val s = Series("date", Seq(d("2001-01-01"), d("2001-02-01"), d("2001-03-01"), d("2001-04-01")))
    check(s.dt.week,
      "shape: (4,)\nSeries: 'date' [i8]\n[\n\t1\n\t5\n\t9\n\t13\n]")
  }

  test("dt.weekday: Monday is 1, Sunday is 7") {
    val s = Series("date", (1 to 7).map(i => d(f"2001-01-0$i")))
    check(s.dt.weekday,
      "shape: (7,)\nSeries: 'date' [i8]\n[\n\t1\n\t2\n\t3\n\t4\n\t5\n\t6\n\t7\n]")
  }

  test("dt.day over a 2d range") {
    val s = Series("date", Seq(1, 3, 5, 7, 9).map(i => d(f"2001-01-0$i")))
    check(s.dt.day,
      "shape: (5,)\nSeries: 'date' [i8]\n[\n\t1\n\t3\n\t5\n\t7\n\t9\n]")
  }

  test("dt.ordinal_day is i16") {
    val s = Series("date", Seq(d("2001-01-01"), d("2001-02-01"), d("2001-03-01")))
    check(s.dt.ordinalDay,
      "shape: (3,)\nSeries: 'date' [i16]\n[\n\t1\n\t32\n\t60\n]")
  }

  test("dt.hour / dt.minute are i8") {
    val h = Series("datetime", (0 to 3).map(i => ts(f"2001-01-01 0$i:00:00")))
    check(h.dt.hour,
      "shape: (4,)\nSeries: 'datetime' [i8]\n[\n\t0\n\t1\n\t2\n\t3\n]")
    val m = Series("datetime", Seq(0, 2, 4).map(i => ts(f"2001-01-01 00:0$i:00")))
    check(m.dt.minute,
      "shape: (3,)\nSeries: 'datetime' [i8]\n[\n\t0\n\t2\n\t4\n]")
  }

  test("dt.second: integer i8 and fractional f64 over 500ms steps") {
    val vals = (0 to 8).map { i =>
      ts(f"2001-01-01 00:00:0${i / 2}%d${if (i % 2 == 1) ".5" else ""}")
    }
    val s = Series("datetime", vals)
    check(s.dt.second,
      "shape: (9,)\nSeries: 'datetime' [i8]\n[\n\t0\n\t0\n\t1\n\t1\n\t2\n\t2\n\t3\n\t3\n\t4\n]")
    check(s.dt.second(fractional = true),
      "shape: (9,)\nSeries: 'datetime' [f64]\n[\n\t0.0\n\t0.5\n\t1.0\n\t1.5\n\t2.0\n\t2.5\n\t3.0\n\t3.5\n\t4.0\n]")
  }

  test("dt.millisecond / microsecond / nanosecond are i32") {
    val vals = (0 to 8).map { i =>
      ts(f"2001-01-01 00:00:0${i / 2}%d${if (i % 2 == 1) ".5" else ""}")
    }
    val s = Series("datetime", vals)
    check(s.dt.millisecond,
      "shape: (9,)\nSeries: 'datetime' [i32]\n[\n\t0\n\t500\n\t0\n\t500\n\t0\n\t500\n\t0\n\t500\n\t0\n]")
    check(s.dt.microsecond,
      "shape: (9,)\nSeries: 'datetime' [i32]\n[\n\t0\n\t500000\n\t0\n\t500000\n\t0\n\t500000\n\t0\n\t500000\n\t0\n]")
    check(s.dt.nanosecond,
      "shape: (9,)\nSeries: 'datetime' [i32]\n[\n\t0\n\t500000000\n\t0\n\t500000000\n\t0\n\t500000000\n\t0\n\t500000000\n\t0\n]")
  }

  test("dt.to_string / strftime render the formatted strings") {
    val s = Series("datetime",
      Seq(ts("2020-03-01 00:00:00"), ts("2020-04-01 00:00:00"), ts("2020-05-01 00:00:00")))
    val expected =
      "shape: (3,)\nSeries: 'datetime' [str]\n[\n\t\"2020/03/01\"\n\t\"2020/04/01\"\n\t\"2020/05/01\"\n]"
    check(s.dt.toString("%Y/%m/%d"), expected)
    check(s.dt.strftime("%Y/%m/%d"), expected)
  }

  test("dt.epoch: default µs and seconds, renamed via alias") {
    val s = Series("datetime",
      Seq(ts("2001-01-01 00:00:00"), ts("2001-01-02 00:00:00"), ts("2001-01-03 00:00:00")))
    check(s.dt.epoch().alias("epoch_ns"),
      "shape: (3,)\nSeries: 'epoch_ns' [i64]\n[\n\t978307200000000\n\t978393600000000\n\t978480000000000\n]")
    check(s.dt.epoch("s").alias("epoch_s"),
      "shape: (3,)\nSeries: 'epoch_s' [i64]\n[\n\t978307200\n\t978393600\n\t978480000\n]")
  }

  test("dt.total_days / total_hours / total_minutes over datetime diffs") {
    val mo = Series("datetime",
      Seq(ts("2020-03-01 00:00:00"), ts("2020-04-01 00:00:00"), ts("2020-05-01 00:00:00")))
    check(mo.dt.epoch().diff().dt.totalDays,
      "shape: (3,)\nSeries: 'datetime' [i64]\n[\n\tnull\n\t31\n\t30\n]")
    val dd = Series("datetime", (1 to 4).map(i => ts(f"2020-01-0$i 00:00:00")))
    check(dd.dt.epoch().diff().dt.totalHours,
      "shape: (4,)\nSeries: 'datetime' [i64]\n[\n\tnull\n\t24\n\t24\n\t24\n]")
    check(dd.dt.epoch().diff().dt.totalMinutes,
      "shape: (4,)\nSeries: 'datetime' [i64]\n[\n\tnull\n\t1440\n\t1440\n\t1440\n]")
  }

  test("dt.month_start / month_end preserve the time of day") {
    val s = Series("datetime", Seq(
      ts("2000-01-02 02:00:00"), ts("2000-02-02 02:00:00"),
      ts("2000-03-02 02:00:00"), ts("2000-04-02 02:00:00")))
    check(s.dt.monthStart,
      "shape: (4,)\nSeries: 'datetime' [datetime[μs]]\n[\n\t2000-01-01 02:00:00\n\t2000-02-01 02:00:00\n\t2000-03-01 02:00:00\n\t2000-04-01 02:00:00\n]")
    check(s.dt.monthEnd,
      "shape: (4,)\nSeries: 'datetime' [datetime[μs]]\n[\n\t2000-01-31 02:00:00\n\t2000-02-29 02:00:00\n\t2000-03-31 02:00:00\n\t2000-04-30 02:00:00\n]")
  }

  test("dt.offset_by: +1y and the mixed -1y2mo calendar offset") {
    val dates = Series("datetime", (2000 to 2005).map(y => ts(f"$y-01-01 00:00:00")))
    check(dates.dt.offsetBy("1y").alias("date_plus_1y"),
      "shape: (6,)\nSeries: 'date_plus_1y' [datetime[μs]]\n[\n\t2001-01-01 00:00:00\n\t2002-01-01 00:00:00\n\t2003-01-01 00:00:00\n\t2004-01-01 00:00:00\n\t2005-01-01 00:00:00\n\t2006-01-01 00:00:00\n]")
    check(dates.dt.offsetBy("-1y2mo").alias("date_minus_1y_2mon"),
      "shape: (6,)\nSeries: 'date_minus_1y_2mon' [datetime[μs]]\n[\n\t1998-11-01 00:00:00\n\t1999-11-01 00:00:00\n\t2000-11-01 00:00:00\n\t2001-11-01 00:00:00\n\t2002-11-01 00:00:00\n\t2003-11-01 00:00:00\n]")
  }

  // ---- string_name_space.rb ----

  test("str.join ignores nulls by default; ignore_nulls false propagates") {
    val s = Series("", Seq[Any](1L, null, 2L))
    check(s.str.join("-"),
      "shape: (1,)\nSeries: '' [str]\n[\n\t\"1-2\"\n]")
    check(s.str.join("-", ignoreNulls = false),
      "shape: (1,)\nSeries: '' [str]\n[\n\tnull\n]")
  }

  test("str.contains: regex and literal keep nulls") {
    val s = Series("", Seq[Any]("Crab", "cat and dog", "rab$bit", null))
    check(s.str.contains("cat|bit"),
      "shape: (4,)\nSeries: '' [bool]\n[\n\tfalse\n\ttrue\n\ttrue\n\tnull\n]")
    check(s.str.contains("rab$", literal = true),
      "shape: (4,)\nSeries: '' [bool]\n[\n\tfalse\n\tfalse\n\ttrue\n\tnull\n]")
  }

  test("str.starts_with / ends_with on the fruits series") {
    val s = Series("fruits", Seq[Any]("apple", "mango", null))
    check(s.str.endsWith("go"),
      "shape: (3,)\nSeries: 'fruits' [bool]\n[\n\tfalse\n\ttrue\n\tnull\n]")
    check(s.str.startsWith("app"),
      "shape: (3,)\nSeries: 'fruits' [bool]\n[\n\ttrue\n\tfalse\n\tnull\n]")
  }

  test("str.to_date with an explicit format") {
    val s = Series("", Seq("2020/01/01", "2020/02/01", "2020/03/01"))
    check(s.str.toDate("%Y/%m/%d"),
      "shape: (3,)\nSeries: '' [date]\n[\n\t2020-01-01\n\t2020-02-01\n\t2020-03-01\n]")
  }

  test("cat.get_categories lists categories in first-appearance order") {
    val s = Series("", Seq("foo", "bar", "foo", "foo", "ham"))
    check(s.cat.getCategories,
      "shape: (3,)\nSeries: '' [str]\n[\n\t\"foo\"\n\t\"bar\"\n\t\"ham\"\n]")
  }

  test("series.rb cut with labels renders the categories (physically str, §1.2)") {
    val s = Series("foo", Seq(-2L, -1L, 0L, 1L, 2L))
    check(s.cut(Seq(-1, 1), Some(Seq("a", "b", "c"))),
      "shape: (5,)\nSeries: 'foo' [str]\n[\n\t\"a\"\n\t\"a\"\n\t\"b\"\n\t\"b\"\n\t\"c\"\n]")
  }

  // ---- list_name_space.rb ----

  test("list.all / list.any: null elements ignored, empty list vacuous, null list null") {
    val s = Series("", Seq[Any](
      Seq(true, true), Seq(false, true), Seq(false, false), Seq[Any](null), Seq.empty[Any], null))
    check(s.list.all,
      "shape: (6,)\nSeries: '' [bool]\n[\n\ttrue\n\tfalse\n\tfalse\n\ttrue\n\ttrue\n\tnull\n]")
    check(s.list.any,
      "shape: (6,)\nSeries: '' [bool]\n[\n\ttrue\n\ttrue\n\tfalse\n\tfalse\n\tfalse\n\tnull\n]")
  }

  test("list.drop_nulls preserves order and keeps empty results") {
    val s = Series("values", Seq(Seq[Any](null, 1L, null, 2L), Seq[Any](null), Seq[Any](3L, 4L)))
    check(s.list.dropNulls,
      "shape: (3,)\nSeries: 'values' [list[i64]]\n[\n\t[1, 2]\n\t[]\n\t[3, 4]\n]")
  }

  test("list.join with a separator") {
    val s = Series("", Seq(Seq("foo", "bar"), Seq("hello", "world")))
    check(s.list.join("-"),
      "shape: (2,)\nSeries: '' [str]\n[\n\t\"foo-bar\"\n\t\"hello-world\"\n]")
  }

  test("list.diff: 4-element result renders with the ellipsis") {
    val s = Series("a", Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 2L, 1L)))
    check(s.list.diff(),
      "shape: (2,)\nSeries: 'a' [list[i64]]\n[\n\t[null, 1, … 1]\n\t[null, -8, -1]\n]")
  }
}
