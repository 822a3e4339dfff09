package graft

import graft.kernel.{AsofJoin, DurationDsl, Strftime}
import org.apache.spark.sql.{functions => F}

class KernelSpec extends SparkSpec {
  import spark.implicits._

  test("duration DSL parses compound strings") {
    assert(DurationDsl.parse("3d12h").totalNanos == (3L * 86400 + 12L * 3600) * 1000000000L)
    assert(DurationDsl.parse("90s").totalSeconds == 90.0)
    assert(DurationDsl.parse("1mo").months == 1)
    assert(DurationDsl.parse("1y").months == 12)
    assert(DurationDsl.parse("2i").indexCount == 2)
    assert(DurationDsl.parse("1h30m").totalMicros == 5400L * 1000000)
    intercept[IllegalArgumentException](DurationDsl.parse("abc"))
  }

  test("strftime translation") {
    assert(Strftime.toJava("%Y-%m-%d") == "yyyy-MM-dd")
    assert(Strftime.toJava("%H:%M:%S") == "HH:mm:ss")
    assert(Strftime.toJava("%d/%m/%Y %H:%M") == "dd/MM/yyyy HH:mm")
    assert(Strftime.toJava("%Y年") == "yyyy'年'")
  }

  test("asof join backward") {
    val quotes = Seq((1L, 10.0), (5L, 11.0), (9L, 12.0)).toDF("t", "px")
    val trades = Seq((0L, "a"), (4L, "b"), (5L, "c"), (10L, "d")).toDF("t", "sym")
    val out = AsofJoin.join(trades, quotes, on = "t")
      .orderBy("t").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ==
      Seq(None, Some(10.0), Some(11.0), Some(12.0)))
  }

  test("asof join forward") {
    val quotes = Seq((1L, 10.0), (5L, 11.0)).toDF("t", "px")
    val trades = Seq((0L, "a"), (2L, "b"), (6L, "c")).toDF("t", "sym")
    val out = AsofJoin.join(trades, quotes, on = "t", strategy = "forward")
      .orderBy("t").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ==
      Seq(Some(10.0), Some(11.0), None))
  }

  test("asof join nearest") {
    val quotes = Seq((0L, 10.0), (10L, 20.0)).toDF("t", "px")
    val trades = Seq((3L, "a"), (8L, "b")).toDF("t", "sym")
    val out = AsofJoin.join(trades, quotes, on = "t", strategy = "nearest")
      .orderBy("t").collect()
    assert(out.map(r => r.getDouble(r.fieldIndex("px"))).toSeq == Seq(10.0, 20.0))
  }

  test("asof join with by-groups and tolerance") {
    val quotes = Seq(("A", 1L, 10.0), ("B", 1L, 99.0), ("A", 8L, 12.0))
      .toDF("sym", "t", "px")
    val trades = Seq(("A", 2L), ("B", 9L), ("A", 9L)).toDF("sym", "t")
    val out = AsofJoin.join(trades, quotes, on = "t", by = Seq("sym"))
      .orderBy("sym", "t").collect()
    assert(out.map(r => r.getDouble(r.fieldIndex("px"))).toSeq == Seq(10.0, 12.0, 99.0))
    val tol = AsofJoin.join(trades, quotes, on = "t", by = Seq("sym"), tolerance = Some(2.0))
      .orderBy("sym", "t").collect()
    assert(tol.map(r => Option(r.get(r.fieldIndex("px")))).toSeq ==
      Seq(Some(10.0), Some(12.0), None)) // B@9 matched B@1 but distance 8 > 2
  }

  test("asof join suffixes only clashing right columns") {
    val quotes = Seq((1L, 10.0, "q1"), (5L, 11.0, "q2")).toDF("t", "px", "tag")
    val trades = Seq((2L, "a"), (6L, "b")).toDF("t", "tag")
    val out = AsofJoin.join(trades, quotes, on = "t")
    // `tag` clashes with the left frame -> suffixed; `px` does not -> bare
    assert(out.columns.toSet == Set("t", "tag", "px", "tag_right"))
  }

  test("strftime week-based directives computed natively") {
    // 2021-01-01 is a Friday in ISO week 53 of ISO year 2020
    val df = Seq("2021-01-01", "2021-01-04", "2024-12-30").toDF("d")
      .select(F.to_date(F.col("d")).as("d"))
    val out = df.select(Strftime.format(F.col("d"), "%G-W%V-%u").as("iso")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("2020-W53-5", "2021-W01-1", "2025-W01-1"))
    assert(intercept[IllegalArgumentException](Strftime.toJava("%G")).getMessage.contains("week-based"))
  }
}
