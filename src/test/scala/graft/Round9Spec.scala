package graft

import graft.Polars._
import graft.api.LazyFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-8 late-session pins: group_by_dynamic closed/start_by parameters
  * (reference lazy_frame.rb:1416-1430 signature — closed left|right|both|none,
  * start_by window|datapoint|weekday). */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // 2021-12-16 00:00 .. 03:00 every 30 minutes (the polars doc dataset)
  private val t0 = java.time.LocalDateTime.of(2021, 12, 16, 0, 0)
    .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
  private lazy val df = LazyFrame(
    (0 until 7).map(i => (i.toLong, t0 + i * 1800000000L)).toDF("n", "tus")
      .withColumn("dt", F.timestamp_micros(F.col("tus"))).drop("tus"))

  private def run(closed: String = "left", startBy: String = "window",
                  every: String = "1h"): Map[Long, Seq[Long]] =
    df.groupByDynamic("dt", every = every, closed = closed, startBy = startBy)
      .agg(Expr(F.sort_array(F.collect_list(F.col("n")))).alias("ns"))
      .toSpark.collect()
      .map(r => ((r.getTimestamp(0).getTime * 1000 - t0) / 60000000L) ->
        r.getSeq[Long](1)).toMap

  test("group_by_dynamic closed=left (default): [s, s+1h) windows") {
    // 00:00→(0,1), 01:00→(2,3), 02:00→(4,5), 03:00→(6)
    assert(run() == Map(0L -> Seq(0L, 1L), 60L -> Seq(2L, 3L),
      120L -> Seq(4L, 5L), 180L -> Seq(6L)))
  }

  test("group_by_dynamic closed=right: (s, s+1h] windows, boundary rolls back") {
    // 23:00→(0), 00:00→(1,2), 01:00→(3,4), 02:00→(5,6)  [polars doc example]
    assert(run(closed = "right") == Map(-60L -> Seq(0L), 0L -> Seq(1L, 2L),
      60L -> Seq(3L, 4L), 120L -> Seq(5L, 6L)))
  }

  test("group_by_dynamic closed=both: boundary points join both windows") {
    val got = run(closed = "both")
    // every on-the-hour point (n even) also joins the previous window
    assert(got(-60L) == Seq(0L))
    assert(got(0L) == Seq(0L, 1L, 2L))
    assert(got(60L) == Seq(2L, 3L, 4L))
    assert(got(120L) == Seq(4L, 5L, 6L))
    assert(got(180L) == Seq(6L))
  }

  test("group_by_dynamic closed=none: boundary points join no window") {
    // strictly-inside points only: the half-hour points
    assert(run(closed = "none") == Map(0L -> Seq(1L), 60L -> Seq(3L),
      120L -> Seq(5L)))
  }

  test("group_by_dynamic start_by=datapoint anchors windows at the first point") {
    // drop n=0 so the first datapoint is 00:30; windows 00:30-01:30, ...
    val shifted = LazyFrame(df.toSpark.filter(F.col("n") > 0))
      .groupByDynamic("dt", every = "1h", startBy = "datapoint")
      .agg(Expr(F.sort_array(F.collect_list(F.col("n")))).alias("ns"))
      .toSpark.collect()
      .map(r => ((r.getTimestamp(0).getTime * 1000 - t0) / 60000000L) ->
        r.getSeq[Long](1)).toMap
    assert(shifted == Map(30L -> Seq(1L, 2L), 90L -> Seq(3L, 4L),
      150L -> Seq(5L, 6L)))
  }

  test("group_by_dynamic start_by=monday aligns weekly windows on Monday") {
    // 2021-12-16 is a Thursday; the covering Monday-start week is 2021-12-13
    val got = df.groupByDynamic("dt", every = "1w", startBy = "monday")
      .agg(Expr(F.count(F.lit(1))).alias("n"))
      .toSpark.collect()
    assert(got.length == 1)
    val start = got(0).getTimestamp(0).toLocalDateTime
    assert(start == java.time.LocalDateTime.of(2021, 12, 13, 0, 0), start)
    assert(got(0).getLong(1) == 7L)
  }

  test("group_by_dynamic invalid closed/start_by raise directed errors") {
    val e1 = intercept[IllegalArgumentException] { run(closed = "weird") }
    assert(e1.getMessage.contains("closed must be"))
    val e2 = intercept[IllegalArgumentException] { run(startBy = "weird") }
    assert(e2.getMessage.contains("start_by must be"))
    val e3 = intercept[IllegalArgumentException] {
      df.groupByDynamic("dt", every = "1mo", startBy = "datapoint")
        .agg(Expr(F.count(F.lit(1))).alias("n")).toSpark
    }
    assert(e3.getMessage.contains("start_by"))
  }
}
