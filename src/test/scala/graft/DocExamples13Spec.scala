package graft

import graft.Polars._
import graft.api.DataFrame
import graft.testing.Testing

/** Round-13 tranche 12 of the reference `@example` golden corpus —
  * remaining expr.rb blocks: where (filter alias) with the sum identity,
  * flatten inside group_by.agg, first in select, and shift_and_fill's
  * type-promoting fill value. */
class DocExamples13Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("expr.rb where: filter alias inside agg, empty slice sums to 0") {
    val df = DataFrame(Seq(("g1", 1L), ("g1", 2L), ("g2", 3L)).toDF("group_col", "b"))
    check(df.groupBy("group_col").agg(
      col("b").where(col("b") < 2).sum.alias("lt"),
      col("b").where(col("b") >= 2).sum.alias("gte"))
      .sortBy(Seq(col("group_col"))),
      """shape: (2, 3)
        |┌───────────┬─────┬─────┐
        |│ group_col ┆ lt  ┆ gte │
        |│ ---       ┆ --- ┆ --- │
        |│ str       ┆ i64 ┆ i64 │
        |╞═══════════╪═════╪═════╡
        |│ g1        ┆ 1   ┆ 2   │
        |│ g2        ┆ 0   ┆ 3   │
        |└───────────┴─────┴─────┘""")
  }

  test("expr.rb flatten: lists concatenate per group") {
    val df = DataFrame(Seq(
      ("a", Seq(1L, 2L)), ("b", Seq(2L, 3L)), ("b", Seq(4L))).toDF("group", "values"))
    check(df.groupBy(Seq("group"), maintainOrder = true)
      .agg(col("values").flatten),
      """shape: (2, 2)
        |┌───────┬───────────┐
        |│ group ┆ values    │
        |│ ---   ┆ ---       │
        |│ str   ┆ list[i64] │
        |╞═══════╪═══════════╡
        |│ a     ┆ [1, 2]    │
        |│ b     ┆ [2, 3, 4] │
        |└───────┴───────────┘""")
  }

  test("expr.rb first in select") {
    val df = DataFrame(Seq(1L, 1L, 2L).toDF("a"))
    check(df.select(col("a").first),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |└─────┘""")
  }

  test("expr.rb shift_and_fill: a str fill value promotes the column") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L).toDF("foo"))
    check(df.select(col("foo").shiftAndFill(1, "a")),
      """shape: (4, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ str │
        |╞═════╡
        |│ a   │
        |│ 1   │
        |│ 2   │
        |│ 3   │
        |└─────┘""")
  }
}
