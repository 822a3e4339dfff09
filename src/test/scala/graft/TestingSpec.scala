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
