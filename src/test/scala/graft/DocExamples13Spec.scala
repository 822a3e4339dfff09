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

  test("vertical.rb all.sum over bool columns counts trues (values; u32->i64)") {
    val df = DataFrame(Seq((true, false), (false, false), (true, false)).toDF("a", "b"))
    val got = df.select(col("a").sum.alias("a"), col("b").sum.alias("b"))
      .toSpark.collect()(0)
    assert(got.getLong(0) == 2L && got.getLong(1) == 0L)
    // and mean is the fraction true
    val m = df.select(col("a").mean.alias("a")).toSpark.collect()(0)
    assert(m.getDouble(0) == 2.0 / 3.0)
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

  test("horizontal.rb all/any: Kleene nulls across columns") {
    val df = DataFrame(Seq(
      (Some(false), Some(false), "u"), (Some(false), Some(true), "v"),
      (Some(true), Some(true), "w"), (Some(true), None, "x"),
      (Some(false), None, "y"), (None, None, "z"))
      .map { case (a, b, c) => (a.map(Boolean.box).orNull, b.map(Boolean.box).orNull, c) }
      .toDF("a", "b", "c"))
    check(df.withColumns(Seq(Polars.allHorizontal(col("a"), col("b")).alias("all"))),
      """shape: (6, 4)
        |┌───────┬───────┬─────┬───────┐
        |│ a     ┆ b     ┆ c   ┆ all   │
        |│ ---   ┆ ---   ┆ --- ┆ ---   │
        |│ bool  ┆ bool  ┆ str ┆ bool  │
        |╞═══════╪═══════╪═════╪═══════╡
        |│ false ┆ false ┆ u   ┆ false │
        |│ false ┆ true  ┆ v   ┆ false │
        |│ true  ┆ true  ┆ w   ┆ true  │
        |│ true  ┆ null  ┆ x   ┆ null  │
        |│ false ┆ null  ┆ y   ┆ false │
        |│ null  ┆ null  ┆ z   ┆ null  │
        |└───────┴───────┴─────┴───────┘""")
    check(df.withColumns(Seq(Polars.anyHorizontal(col("a"), col("b")).alias("any"))),
      """shape: (6, 4)
        |┌───────┬───────┬─────┬───────┐
        |│ a     ┆ b     ┆ c   ┆ any   │
        |│ ---   ┆ ---   ┆ --- ┆ ---   │
        |│ bool  ┆ bool  ┆ str ┆ bool  │
        |╞═══════╪═══════╪═════╪═══════╡
        |│ false ┆ false ┆ u   ┆ false │
        |│ false ┆ true  ┆ v   ┆ true  │
        |│ true  ┆ true  ┆ w   ┆ true  │
        |│ true  ┆ null  ┆ x   ┆ true  │
        |│ false ┆ null  ┆ y   ┆ null  │
        |│ null  ┆ null  ┆ z   ┆ null  │
        |└───────┴───────┴─────┴───────┘""")
  }

  test("horizontal.rb max/min/sum skip nulls across columns") {
    val df = DataFrame(Seq(
      (Some(1L), Some(4L), "x"), (Some(8L), Some(5L), "y"), (Some(3L), None, "z"))
      .map { case (a, b, c) => (a.map(Long.box).orNull, b.map(Long.box).orNull, c) }
      .toDF("a", "b", "c"))
    check(df.withColumns(Seq(Polars.maxHorizontal(col("a"), col("b")).alias("max"))),
      """shape: (3, 4)
        |┌─────┬──────┬─────┬─────┐
        |│ a   ┆ b    ┆ c   ┆ max │
        |│ --- ┆ ---  ┆ --- ┆ --- │
        |│ i64 ┆ i64  ┆ str ┆ i64 │
        |╞═════╪══════╪═════╪═════╡
        |│ 1   ┆ 4    ┆ x   ┆ 4   │
        |│ 8   ┆ 5    ┆ y   ┆ 8   │
        |│ 3   ┆ null ┆ z   ┆ 3   │
        |└─────┴──────┴─────┴─────┘""")
    check(df.withColumns(Seq(Polars.sumHorizontal(col("a"), col("b")).alias("sum"))),
      """shape: (3, 4)
        |┌─────┬──────┬─────┬─────┐
        |│ a   ┆ b    ┆ c   ┆ sum │
        |│ --- ┆ ---  ┆ --- ┆ --- │
        |│ i64 ┆ i64  ┆ str ┆ i64 │
        |╞═════╪══════╪═════╪═════╡
        |│ 1   ┆ 4    ┆ x   ┆ 5   │
        |│ 8   ┆ 5    ┆ y   ┆ 13  │
        |│ 3   ┆ null ┆ z   ┆ 3   │
        |└─────┴──────┴─────┴─────┘""")
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
