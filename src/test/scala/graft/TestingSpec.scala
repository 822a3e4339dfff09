package graft

import graft.api.{DataFrame, Series, Config}
import graft.testing.Testing

class TestingSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("assertFrameEqual passes on equal, fails on different") {
    val a = Seq((1, "x"), (2, "y")).toDF("i", "s")
    val b = Seq((1, "x"), (2, "y")).toDF("i", "s")
    Testing.assertFrameEqual(a, b)
    val c = Seq((1, "x"), (2, "z")).toDF("i", "s")
    intercept[Testing.FrameMismatch](Testing.assertFrameEqual(a, c))
  }

  test("assertFrameEqual float tolerance and row order flag") {
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(1.0 + 1e-9, 2.0).toDF("v")
    Testing.assertFrameEqual(a, b)
    val shuffled = Seq(2.0, 1.0).toDF("v")
    intercept[Testing.FrameMismatch](Testing.assertFrameEqual(a, shuffled))
    Testing.assertFrameEqual(a, shuffled, checkRowOrder = false)
  }

  test("render produces polars-style box table") {
    val df = Seq((1L, "one", 1.5), (2L, "two", 2.5)).toDF("a", "b", "c")
    val out = Testing.render(df)
    assert(out.startsWith("shape: (2, 3)"))
    assert(out.contains("┌") && out.contains("╞") && out.contains("┆"))
    assert(out.contains("i64") && out.contains("str") && out.contains("f64"))
    assert(out.contains("---")) // the polars separator row
    assert(out.contains("one") && out.contains("1.5"))
  }

  test("render over maxRows shows head 5 / ellipsis row / tail 5, like polars") {
    val df = DataFrame((1L to 12L).map(i => (i, s"v$i")).toDF("i", "s"))
    val got = Testing.render(df.toSpark)
    val lines = got.split("\n").toSeq
    assert(lines.head == "shape: (12, 2)", got)
    // 5 head rows, one ellipsis row, 5 tail rows between the header rules
    val body = lines.dropWhile(!_.startsWith("\u255e")).drop(1).takeWhile(_.startsWith("\u2502"))
    assert(body.length == 11, got)
    assert(body(0).contains(" 1 ") && body(4).contains(" 5 "), got)
    assert(body(5).contains("\u2026"), got)
    assert(body(6).contains(" 8 ") && body(10).contains(" 12 "), got)
    val s12 = Series("n", (1L to 12L))
    val sr = Testing.renderSeries(s12)
    assert(sr.contains("\t5\n\t\u2026\n\t8\n"), sr)
  }

  test("series construction, accessors and equality") {
    val s = Series("x", Seq(1.0, 2.0, 3.0))
    assert(s.len == 3)
    assert(s.sum == 6.0)
    assert(s.mean == 2.0)
    assert(s.dtype.typeName == "double")
    val doubled = s.map(_ * 2).rename("x")
    Testing.assertSeriesEqual(Series("x", Seq(2.0, 4.0, 6.0)), doubled)
    val vc = Series("k", Seq("a", "b", "a")).valueCounts(sort = true).toSpark.collect()
    assert(vc.head.getString(0) == "a" && vc.head.getLong(1) == 2)
  }

  test("config scoping") {
    assert(Config.maxRows == 10)
    Config.withConfig(rows = 3) { assert(Config.maxRows == 3) }
    assert(Config.maxRows == 10)
  }
}
