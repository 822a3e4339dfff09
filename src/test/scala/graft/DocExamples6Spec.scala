package graft

import java.sql.Timestamp
import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing

/** Round-12 tranche 5 of the reference `@example` golden corpus:
  * date_time_expr round/truncate and the lazy_frame rolling example.
  * Verbatim expected renders except the datetime time-unit tag: the
  * reference examples build ns-unit datetimes (Ruby DateTime), graft's
  * single mapped unit is µs (SURVEY §1.2), so headers read datetime[μs] —
  * the VALUES are ported exactly. */
class DocExamples6Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("date_time_expr.rb round('1h') maps each half-interval to its nearer bucket edge") {
    val vals = Seq("2001-01-01 00:00:00", "2001-01-01 03:45:00", "2001-01-01 07:30:00",
      "2001-01-01 11:15:00", "2001-01-01 15:00:00", "2001-01-01 18:45:00",
      "2001-01-01 22:30:00").map(ts)
    val df = DataFrame(vals.toDF("datetime"))
    check(df.withColumns(Seq(col("datetime").dt.round("1h").alias("round"))),
      """shape: (7, 2)
        |┌─────────────────────┬─────────────────────┐
        |│ datetime            ┆ round               │
        |│ ---                 ┆ ---                 │
        |│ datetime[μs]        ┆ datetime[μs]        │
        |╞═════════════════════╪═════════════════════╡
        |│ 2001-01-01 00:00:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 03:45:00 ┆ 2001-01-01 04:00:00 │
        |│ 2001-01-01 07:30:00 ┆ 2001-01-01 08:00:00 │
        |│ 2001-01-01 11:15:00 ┆ 2001-01-01 11:00:00 │
        |│ 2001-01-01 15:00:00 ┆ 2001-01-01 15:00:00 │
        |│ 2001-01-01 18:45:00 ┆ 2001-01-01 19:00:00 │
        |│ 2001-01-01 22:30:00 ┆ 2001-01-01 23:00:00 │
        |└─────────────────────┴─────────────────────┘""")
  }

  test("date_time_expr.rb round('30m') over a 10m grid") {
    val vals = (0 to 6).map(i => ts(f"2001-01-01 0${i / 6}:${(i * 10) % 60}%02d:00"))
    val df = DataFrame(vals.toDF("datetime"))
    check(df.withColumns(Seq(col("datetime").dt.round("30m").alias("round"))),
      """shape: (7, 2)
        |┌─────────────────────┬─────────────────────┐
        |│ datetime            ┆ round               │
        |│ ---                 ┆ ---                 │
        |│ datetime[μs]        ┆ datetime[μs]        │
        |╞═════════════════════╪═════════════════════╡
        |│ 2001-01-01 00:00:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 00:10:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 00:20:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 00:30:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 00:40:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 00:50:00 ┆ 2001-01-01 01:00:00 │
        |│ 2001-01-01 01:00:00 ┆ 2001-01-01 01:00:00 │
        |└─────────────────────┴─────────────────────┘""")
  }

  test("date_time_expr.rb truncate('1h') and truncate('30m')") {
    val vals = Seq("2001-01-01 00:00:00", "2001-01-01 03:45:00", "2001-01-01 07:30:00",
      "2001-01-01 11:15:00", "2001-01-01 15:00:00", "2001-01-01 18:45:00",
      "2001-01-01 22:30:00").map(ts)
    check(DataFrame(vals.toDF("datetime")).select(col("datetime").dt.truncate("1h")),
      """shape: (7, 1)
        |┌─────────────────────┐
        |│ datetime            │
        |│ ---                 │
        |│ datetime[μs]        │
        |╞═════════════════════╡
        |│ 2001-01-01 00:00:00 │
        |│ 2001-01-01 03:00:00 │
        |│ 2001-01-01 07:00:00 │
        |│ 2001-01-01 11:00:00 │
        |│ 2001-01-01 15:00:00 │
        |│ 2001-01-01 18:00:00 │
        |│ 2001-01-01 22:00:00 │
        |└─────────────────────┘""")
    val grid = (0 to 6).map(i => ts(f"2001-01-01 0${i / 6}:${(i * 10) % 60}%02d:00"))
    check(DataFrame(grid.toDF("datetime")).select(
      col("datetime"), col("datetime").dt.truncate("30m").alias("truncate")),
      """shape: (7, 2)
        |┌─────────────────────┬─────────────────────┐
        |│ datetime            ┆ truncate            │
        |│ ---                 ┆ ---                 │
        |│ datetime[μs]        ┆ datetime[μs]        │
        |╞═════════════════════╪═════════════════════╡
        |│ 2001-01-01 00:00:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 00:10:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 00:20:00 ┆ 2001-01-01 00:00:00 │
        |│ 2001-01-01 00:30:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 00:40:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 00:50:00 ┆ 2001-01-01 00:30:00 │
        |│ 2001-01-01 01:00:00 ┆ 2001-01-01 01:00:00 │
        |└─────────────────────┴─────────────────────┘""")
  }

  test("lazy_frame.rb rolling('2d').agg(sum/min/max) per-row trailing windows") {
    val df = DataFrame(Seq(
      ("2020-01-01 13:45:48", 3L), ("2020-01-01 16:42:13", 7L),
      ("2020-01-01 16:45:09", 5L), ("2020-01-02 18:12:48", 9L),
      ("2020-01-03 19:45:32", 2L), ("2020-01-08 23:16:43", 1L))
      .toDF("dt", "a"))
      .withColumns(Seq(col("dt").str.toDatetime()))
    check(df.rolling("dt", "2d").agg(
      "sum_a" -> col("a").sum, "min_a" -> col("a").min, "max_a" -> col("a").max),
      """shape: (6, 4)
        |┌─────────────────────┬───────┬───────┬───────┐
        |│ dt                  ┆ sum_a ┆ min_a ┆ max_a │
        |│ ---                 ┆ ---   ┆ ---   ┆ ---   │
        |│ datetime[μs]        ┆ i64   ┆ i64   ┆ i64   │
        |╞═════════════════════╪═══════╪═══════╪═══════╡
        |│ 2020-01-01 13:45:48 ┆ 3     ┆ 3     ┆ 3     │
        |│ 2020-01-01 16:42:13 ┆ 10    ┆ 3     ┆ 7     │
        |│ 2020-01-01 16:45:09 ┆ 15    ┆ 3     ┆ 7     │
        |│ 2020-01-02 18:12:48 ┆ 24    ┆ 3     ┆ 9     │
        |│ 2020-01-03 19:45:32 ┆ 11    ┆ 2     ┆ 9     │
        |│ 2020-01-08 23:16:43 ┆ 1     ┆ 1     ┆ 1     │
        |└─────────────────────┴───────┴───────┴───────┘""")
  }
}
