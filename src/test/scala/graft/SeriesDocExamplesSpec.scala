package graft

import graft.api.Series
import graft.testing.Testing

/** Series-side slice of the reference's `@example` golden corpus
  * (series.rb docstrings; format `shape: (n,)` / `Series: 'name' [dtype]` /
  * tab-indented values). Same porting rules as DocExamplesSpec; expected
  * strings are verbatim with the docs_test tab convention reversed (tabs
  * here, 8-space expansion there). */
class SeriesDocExamplesSpec extends SparkSpec {
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(s: Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("series.rb sort: ascending and reverse") {
    val s = Series("a", Seq(1L, 3L, 4L, 2L))
    check(s.sort(),
      "shape: (4,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t3\n\t4\n]")
    check(s.sort(descending = true),
      "shape: (4,)\nSeries: 'a' [i64]\n[\n\t4\n\t3\n\t2\n\t1\n]")
  }

  test("series.rb unique.sort") {
    val s = Series("a", Seq(1L, 2L, 2L, 3L))
    check(s.unique.sort(),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t3\n]")
  }

  test("series.rb shift(1) and shift(-1)") {
    val s = Series("a", Seq(1L, 2L, 3L))
    check(s.shift(1),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\tnull\n\t1\n\t2\n]")
    check(s.shift(-1),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t2\n\t3\n\tnull\n]")
  }

  test("series.rb cum_sum") {
    val s = Series("a", Seq(1L, 2L, 3L))
    check(s.cumSum(),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t1\n\t3\n\t6\n]")
  }

  test("series.rb round(2) drops trailing zeros like polars") {
    val s = Series("a", Seq(1.12345, 2.56789, 3.901234))
    check(s.round(2),
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t1.12\n\t2.57\n\t3.9\n]")
  }

  test("series.rb clip(1, 10) with a null") {
    val s = Series("foo", Seq[Any](-50L, 5L, null, 50L))
    check(s.clip(1, 10),
      "shape: (4,)\nSeries: 'foo' [i64]\n[\n\t1\n\t5\n\tnull\n\t10\n]")
  }

  test("series.rb fill_null with a string literal quotes values") {
    val s = Series("b", Seq[Any]("x", null, "z"))
    check(s.fillNull(""),
      "shape: (3,)\nSeries: 'b' [str]\n[\n\t\"x\"\n\t\"\"\n\t\"z\"\n]")
  }

  test("series.rb rank: the 'average' method") {
    val s = Series("a", Seq(3L, 6L, 1L, 1L, 6L))
    check(s.rank(),
      "shape: (5,)\nSeries: 'a' [f64]\n[\n\t3.0\n\t4.5\n\t1.5\n\t1.5\n\t4.5\n]")
  }

  // ---- round-12 tranche (verdict #8) ----

  test("series.rb cum_min / cum_max / cum_prod") {
    val s = Series("a", Seq(3L, 5L, 1L))
    check(s.cumMin(),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t3\n\t3\n\t1\n]")
    check(s.cumMax(),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t3\n\t5\n\t5\n]")
    check(Series("a", Seq(1L, 2L, 3L)).cumProd(),
      "shape: (3,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t6\n]")
  }

  test("series.rb limit / slice / head / tail / take_every") {
    val s = Series("a", Seq(1L, 2L, 3L))
    check(s.limit(2), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n]")
    check(s.head(2), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n]")
    check(s.tail(2), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t2\n\t3\n]")
    val s4 = Series("a", Seq(1L, 2L, 3L, 4L))
    check(s4.slice(1, 2), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t2\n\t3\n]")
    check(s4.takeEvery(2), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t1\n\t3\n]")
  }

  test("series.rb filter by a boolean mask series") {
    val s = Series("a", Seq(1L, 2L, 3L))
    val mask = Series("", Seq(true, false, true))
    check(s.filter(mask), "shape: (2,)\nSeries: 'a' [i64]\n[\n\t1\n\t3\n]")
  }

  test("series.rb top_k / bottom_k") {
    val s = Series("a", Seq(2L, 5L, 1L, 4L, 3L))
    check(s.topK(3), "shape: (3,)\nSeries: 'a' [i64]\n[\n\t5\n\t4\n\t3\n]")
    check(s.bottomK(3), "shape: (3,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t3\n]")
  }

  test("series.rb is_null / is_not_null") {
    val s = Series("a", Seq[Any](1.0, 2.0, 3.0, null))
    check(s.isNull,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\tfalse\n\tfalse\n\tfalse\n\ttrue\n]")
    check(s.isNotNull,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\ttrue\n\ttrue\n\ttrue\n\tfalse\n]")
  }

  test("series.rb is_finite / is_infinite") {
    val s = Series("a", Seq(1.0, 2.0, Double.PositiveInfinity))
    check(s.isFinite,
      "shape: (3,)\nSeries: 'a' [bool]\n[\n\ttrue\n\ttrue\n\tfalse\n]")
    check(s.isInfinite,
      "shape: (3,)\nSeries: 'a' [bool]\n[\n\tfalse\n\tfalse\n\ttrue\n]")
  }

  test("series.rb is_nan / is_not_nan") {
    val s = Series("a", Seq(1.0, 2.0, 3.0, Double.NaN))
    check(s.isNan,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\tfalse\n\tfalse\n\tfalse\n\ttrue\n]")
    check(s.isNotNan,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\ttrue\n\ttrue\n\ttrue\n\tfalse\n]")
  }

  test("series.rb is_unique / is_duplicated") {
    val s = Series("a", Seq(1L, 2L, 2L, 3L))
    check(s.isUnique,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\ttrue\n\tfalse\n\tfalse\n\ttrue\n]")
    check(s.isDuplicated,
      "shape: (4,)\nSeries: 'a' [bool]\n[\n\tfalse\n\ttrue\n\ttrue\n\tfalse\n]")
  }

  test("series.rb explode") {
    val s = Series("a", Seq(Seq(1L, 2L), Seq(3L, 4L), Seq(9L, 10L)))
    check(s.explode,
      "shape: (6,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t3\n\t4\n\t9\n\t10\n]")
  }

  test("series.rb reverse keeps the i8 dtype") {
    val s = Series("a", Seq(1.toByte, 2.toByte, 3.toByte))
    check(s.reverse,
      "shape: (3,)\nSeries: 'a' [i8]\n[\n\t3\n\t2\n\t1\n]")
  }

  test("series.rb fill_nan(0)") {
    val s = Series("a", Seq(1.0, 2.0, 3.0, Double.NaN))
    check(s.fillNan(0),
      "shape: (4,)\nSeries: 'a' [f64]\n[\n\t1.0\n\t2.0\n\t3.0\n\t0.0\n]")
  }

  test("series.rb floor / ceil") {
    val s = Series("a", Seq(1.12345, 2.56789, 3.901234))
    check(s.floor,
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t1.0\n\t2.0\n\t3.0\n]")
    check(s.ceil,
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t2.0\n\t3.0\n\t4.0\n]")
  }

  test("series.rb sign is i64 even for float input") {
    val s = Series("a", Seq[Any](-9.0, -0.0, 0.0, 4.0, null))
    check(s.sign,
      "shape: (5,)\nSeries: 'a' [i64]\n[\n\t-1\n\t0\n\t0\n\t1\n\tnull\n]")
  }

  test("series.rb peak_max / peak_min") {
    check(Series("a", Seq(1L, 2L, 3L, 4L, 5L)).peakMax,
      "shape: (5,)\nSeries: 'a' [bool]\n[\n\tfalse\n\tfalse\n\tfalse\n\tfalse\n\ttrue\n]")
    check(Series("a", Seq(4L, 1L, 3L, 2L, 5L)).peakMin,
      "shape: (5,)\nSeries: 'a' [bool]\n[\n\tfalse\n\ttrue\n\tfalse\n\ttrue\n\tfalse\n]")
  }

  test("series.rb interpolate") {
    val s = Series("a", Seq[Any](1L, 2L, null, null, 5L))
    check(s.interpolate(),
      "shape: (5,)\nSeries: 'a' [f64]\n[\n\t1.0\n\t2.0\n\t3.0\n\t4.0\n\t5.0\n]")
  }

  test("series.rb pct_change(n: 2) on an unnamed series") {
    val s = Series("", Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L))
    check(s.pctChange(2),
      "shape: (10,)\nSeries: '' [f64]\n[\n\tnull\n\tnull\n\t3.0\n\t3.0\n\t3.0\n\t3.0\n\t3.0\n\t3.0\n\t3.0\n\t3.0\n]")
  }

  test("series.rb mode") {
    val s = Series("a", Seq(1L, 2L, 2L, 3L))
    check(s.mode,
      "shape: (1,)\nSeries: 'a' [i64]\n[\n\t2\n]")
  }

  test("expr.rb drop_nulls keeps NaN; drop_nans keeps null (Series surface)") {
    val s = Series("b", Seq[Any](null, 4.0, 4.0, Double.NaN))
    check(s.dropNulls,
      "shape: (3,)\nSeries: 'b' [f64]\n[\n\t4.0\n\t4.0\n\tNaN\n]")
    check(s.dropNans,
      "shape: (3,)\nSeries: 'b' [f64]\n[\n\tnull\n\t4.0\n\t4.0\n]")
  }

  test("series.rb extend_constant(99, 2)") {
    val s = Series("a", Seq(1L, 2L, 3L))
    check(s.extendConstant(99, 2),
      "shape: (5,)\nSeries: 'a' [i64]\n[\n\t1\n\t2\n\t3\n\t99\n\t99\n]")
  }
}
