package graft

import graft.Polars.col
import graft.api.{DataFrame, Series}
import graft.testing.Testing

/** Round-12 tranche 6 of the reference `@example` golden corpus: list_expr
  * depth — concat, unique, shift/slice/tail (Series display forms), struct
  * conversion already covered elsewhere. Verbatim expected renders. */
class DocExamples7Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkForSeries: org.apache.spark.sql.SparkSession = spark

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

  test("list_expr.rb reverse") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq(9L, 1L, 2L)).toDF("a"))
    check(df.select(col("a").list.reverse),
      """shape: (2, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ list[i64] │
        |╞═══════════╡
        |│ [1, 2, 3] │
        |│ [2, 1, 9] │
        |└───────────┘""")
  }

  test("list_expr.rb unique keeps first-occurrence order") {
    val df = DataFrame(Seq(Seq(1L, 1L, 2L)).toDF("a"))
    check(df.select(col("a").list.unique),
      """shape: (1, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ list[i64] │
        |╞═══════════╡
        |│ [1, 2]    │
        |└───────────┘""")
  }

  test("list_expr.rb concat joins two list columns element-wise") {
    val df = DataFrame(Seq(
      (Seq("a"), Seq("b", "c")), (Seq("x"), Seq("y", "z"))).toDF("a", "b"))
    check(df.select(col("a").list.concat(col("b"))),
      """shape: (2, 1)
        |┌─────────────────┐
        |│ a               │
        |│ ---             │
        |│ list[str]       │
        |╞═════════════════╡
        |│ ["a", "b", "c"] │
        |│ ["x", "y", "z"] │
        |└─────────────────┘""")
  }

  test("list_expr.rb shift / slice / tail on the Series surface") {
    val s = Series("a", Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 2L, 1L)))
    checkS(s.list.shift(),
      "shape: (2,)\nSeries: 'a' [list[i64]]\n[\n\t[null, 1, … 3]\n\t[null, 10, 2]\n]")
    checkS(s.list.slice(1, 2),
      "shape: (2,)\nSeries: 'a' [list[i64]]\n[\n\t[2, 3]\n\t[2, 1]\n]")
    checkS(s.list.tail(2),
      "shape: (2,)\nSeries: 'a' [list[i64]]\n[\n\t[3, 4]\n\t[2, 1]\n]")
  }

  test("list_expr.rb sum over a list column keeps the element dtype (frame form)") {
    val df = DataFrame(Seq(Seq(1L), Seq(2L, 3L)).toDF("values"))
    check(df.select(col("values").list.sum),
      """shape: (2, 1)
        |┌────────┐
        |│ values │
        |│ ---    │
        |│ i64    │
        |╞════════╡
        |│ 1      │
        |│ 5      │
        |└────────┘""")
  }
}
