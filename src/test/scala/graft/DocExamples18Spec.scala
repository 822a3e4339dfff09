package graft

import graft.Polars._
import graft.expr.Expr
import graft.api.{DataFrame, Series}
import graft.testing.Testing

/** Round-15 tranche 17 — the functions/range doc blocks and cat_expr.rb doc
  * blocks (the thinnest-covered remaining reference slices per the r14
  * verdict): int_range/arange eager, date_range + per-row date_ranges,
  * datetime_range(+tz values)/datetime_ranges, time_range/time_ranges
  * (values — the Time dtype renders through its i64 nanos-since-midnight
  * physical mapping, §1.2), and cat.get_categories' first-appearance
  * listing (the FirstSeen aggregate's golden). datetime[ns] headers in the
  * reference render datetime[μs] here — graft's one timestamp unit (§1.2),
  * values verbatim. */
class DocExamples18Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }
  private def checkS(s: Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }
  private def d(s: String): java.sql.Date = java.sql.Date.valueOf(s)
  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("int_range.rb arange eager golden (int_range.rb:22)") {
    checkS(rangeSeries(intRange(0, 3), "arange"),
      "shape: (3,)\nSeries: 'arange' [i64]\n[\n\t0\n\t1\n\t2\n]")
  }

  test("date_range.rb 1mo eager golden (date_range.rb:26)") {
    checkS(rangeSeries(
      dateRange(Expr.lit(d("2022-01-01")), Expr.lit(d("2022-03-01")), "1mo"), "date"),
      "shape: (3,)\nSeries: 'date' [date]\n[\n\t2022-01-01\n\t2022-02-01\n\t2022-03-01\n]")
  }

  test("date_range.rb per-row date_ranges golden (date_range.rb:100)") {
    val df = DataFrame(Seq(
      (d("2022-01-01"), d("2022-01-03")), (d("2022-01-02"), d("2022-01-03")))
      .toDF("start", "end"))
    check(df.withColumn("date_range", dateRanges(col("start"), col("end"))),
      """shape: (2, 3)
        |┌────────────┬────────────┬─────────────────────────────────┐
        |│ start      ┆ end        ┆ date_range                      │
        |│ ---        ┆ ---        ┆ ---                             │
        |│ date       ┆ date       ┆ list[date]                      │
        |╞════════════╪════════════╪═════════════════════════════════╡
        |│ 2022-01-01 ┆ 2022-01-03 ┆ [2022-01-01, 2022-01-02, 2022-… │
        |│ 2022-01-02 ┆ 2022-01-03 ┆ [2022-01-02, 2022-01-03]        │
        |└────────────┴────────────┴─────────────────────────────────┘""")
  }

  test("datetime_range.rb 1mo eager golden (datetime_range.rb:23; ns header renders μs §1.2)") {
    checkS(rangeSeries(
      datetimeRange(Expr.lit(ts("2022-01-01 00:00:00")),
        Expr.lit(ts("2022-03-01 00:00:00")), "1mo"), "datetime"),
      """shape: (3,)
        |Series: 'datetime' [datetime[μs]]
        |[
        |	2022-01-01 00:00:00
        |	2022-02-01 00:00:00
        |	2022-03-01 00:00:00
        |]""")
  }

  test("datetime_range.rb time-zone variant values (datetime_range.rb:36)") {
    // the reference renders local midnights EST; graft timestamps are
    // instants in the UTC session — the same points round-trip through
    // replace_time_zone/convert_time_zone (values, not the tz'd header)
    val got = DataFrame(spark.range(1)
      .select(org.apache.spark.sql.functions.explode(
        datetimeRange(Expr.lit(ts("2022-01-01 00:00:00")),
          Expr.lit(ts("2022-03-01 00:00:00")), "1mo").col).as("dt")))
      .select(col("dt").dt.replaceTimeZone("America/New_York")
        .dt.convertTimeZone("America/New_York").alias("dt"))
      .toSpark.collect().map(_.getTimestamp(0).toString)
    assert(got.toSeq == Seq(
      "2022-01-01 00:00:00.0", "2022-02-01 00:00:00.0", "2022-03-01 00:00:00.0"))
  }

  test("datetime_range.rb per-row datetime_ranges golden (datetime_range.rb:101; ns→μs §1.2)") {
    val df = DataFrame(Seq(
      (ts("2022-01-01 00:00:00"), ts("2022-01-03 00:00:00")),
      (ts("2022-01-02 00:00:00"), ts("2022-01-03 00:00:00")))
      .toDF("start", "end"))
    check(df.select(
      datetimeRanges(col("start"), col("end"), "1d").alias("datetime_range")),
      """shape: (2, 1)
        |┌─────────────────────────────────┐
        |│ datetime_range                  │
        |│ ---                             │
        |│ list[datetime[μs]]              │
        |╞═════════════════════════════════╡
        |│ [2022-01-01 00:00:00, 2022-01-… │
        |│ [2022-01-02 00:00:00, 2022-01-… │
        |└─────────────────────────────────┘""")
  }

  test("time_range.rb 3h15m values (time_range.rb:19; Time renders via its i64 nanos physical §1.2)") {
    val h = 3600L * 1000000000L
    val got = spark.range(1)
      .select(org.apache.spark.sql.functions.explode(
        timeRange(14 * h, 24 * h - 1, "3h15m").col).as("t"))
      .collect().map(_.getLong(0))
    // 14:00:00, 17:15:00, 20:30:00, 23:45:00 as nanos since midnight
    assert(got.toSeq == Seq(14 * h, 17 * h + 15 * 60 * 1000000000L,
      20 * h + 30 * 60 * 1000000000L, 23 * h + 45 * 60 * 1000000000L))
  }

  test("time_range.rb per-row time_ranges values (time_range.rb:87)") {
    val h = 3600L * 1000000000L
    val df = DataFrame(Seq((9 * h, 11 * h), (10 * h, 11 * h)).toDF("start", "end"))
    val got = df.withColumn("time_range", timeRanges(col("start"), col("end")))
      .toSpark.collect().map(_.getSeq[Long](2))
    assert(got(0) == Seq(9 * h, 10 * h, 11 * h))
    assert(got(1) == Seq(10 * h, 11 * h))
  }

  test("cat_expr.rb get_categories golden (cat_expr.rb:16 — first-appearance order)") {
    val df = Series("cats", Seq("foo", "bar", "foo", "foo", "ham")).toFrame
    check(df.select(col("cats").cat.getCategories),
      """shape: (3, 1)
        |┌──────┐
        |│ cats │
        |│ ---  │
        |│ str  │
        |╞══════╡
        |│ foo  │
        |│ bar  │
        |│ ham  │
        |└──────┘""")
  }

  test("get_categories keeps first-appearance order on multi-partition data") {
    // the pre-r15 collect_set spelling was partition-order-arbitrary; the
    // FirstSeen aggregate must hold the row-order listing across partitions
    val base = spark.range(1000).selectExpr(
      "CASE WHEN id = 0 THEN 'z' WHEN id < 500 THEN 'm' ELSE 'a' END AS cats")
    assert(base.rdd.getNumPartitions > 1)
    val got = DataFrame(base).select(col("cats").cat.getCategories)
      .toSpark.collect().map(_.getString(0))
    assert(got.toSeq == Seq("z", "m", "a"))
  }

  test("get_categories grouped form lists per-group categories in row order") {
    val df = DataFrame(Seq(
      ("g1", "foo"), ("g1", "bar"), ("g2", "ham"), ("g1", "foo"), ("g2", "bar"))
      .toDF("g", "cats"))
    val got = df.groupBy("g").agg(col("cats").cat.getCategories.alias("cats"))
      .sortBy(Seq(col("g"))).toSpark.collect()
      .map(r => (r.getString(0), r.getSeq[String](1)))
    assert(got.toSeq == Seq(("g1", Seq("foo", "bar")), ("g2", Seq("ham", "bar"))))
  }
}
