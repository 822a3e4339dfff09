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
}
