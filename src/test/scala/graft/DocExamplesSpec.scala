package graft

import graft.Polars
import graft.api.DataFrame
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}

/** Golden corpus ported from the reference's `@example` docstrings
  * (round-10 verdict #8). The reference's main correctness net string-
  * compares every rendered example table (`test/docs_test.rb:190-209`);
  * this spec ports a high-traffic slice VERBATIM — same inputs, same call
  * chain, same expected rendering — through graft's API and
  * `Testing.render`. Expected strings are copied character-for-character
  * from the reference docstrings (data_frame.rb / expr.rb /
  * string_expr.rb); only u32-typed examples are excluded (Spark has no
  * unsigned ints — documented in COVERAGE.md §dtypes), plus
  * order-nondeterministic ops (unique/pivot), which are value-gated
  * elsewhere. */
class DocExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  // data_frame.rb sort: df.sort("foo", reverse: true)
  private def fooBarHam = DataFrame(Seq(
    (1L, 6.0, "a"), (2L, 7.0, "b"), (3L, 8.0, "c")).toDF("foo", "bar", "ham"))

  test("data_frame.rb sort descending") {
    check(fooBarHam.sort("foo", descending = true),
      """shape: (3, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ f64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 3   ┆ 8.0 ┆ c   │
        |│ 2   ┆ 7.0 ┆ b   │
        |│ 1   ┆ 6.0 ┆ a   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb filter: single and multiple conditions") {
    val df = DataFrame(Seq(
      (1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c")).toDF("foo", "bar", "ham"))
    check(df.filter(Polars.col("foo") < 3),
      """shape: (2, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 6   ┆ a   │
        |│ 2   ┆ 7   ┆ b   │
        |└─────┴─────┴─────┘""")
    check(df.filter((Polars.col("foo") < 3) && (Polars.col("ham") === "a")),
      """shape: (1, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 6   ┆ a   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb select: names, arithmetic, when/then literal naming") {
    val df = DataFrame(Seq(
      (1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c")).toDF("foo", "bar", "ham"))
    check(df.selectNames("foo", "bar"),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ foo ┆ bar │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 1   ┆ 6   │
        |│ 2   ┆ 7   │
        |│ 3   ┆ 8   │
        |└─────┴─────┘""")
    check(df.select(Polars.col("foo") + 1),
      """shape: (3, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 2   │
        |│ 3   │
        |│ 4   │
        |└─────┘""")
    check(df.select(Polars.when(Polars.col("foo") > 2).then(10).otherwise(0)),
      """shape: (3, 1)
        |┌─────────┐
        |│ literal │
        |│ ---     │
        |│ i32     │
        |╞═════════╡
        |│ 0       │
        |│ 0       │
        |│ 10      │
        |└─────────┘""")
  }

  test("data_frame.rb join: left, semi, anti keep polars column order") {
    val other = DataFrame(Seq(
      ("x", "a"), ("y", "b"), ("z", "d")).toDF("apple", "ham"))
    check(fooBarHam.join(other, on = Seq("ham"), how = "left"),
      """shape: (3, 4)
        |┌─────┬─────┬─────┬───────┐
        |│ foo ┆ bar ┆ ham ┆ apple │
        |│ --- ┆ --- ┆ --- ┆ ---   │
        |│ i64 ┆ f64 ┆ str ┆ str   │
        |╞═════╪═════╪═════╪═══════╡
        |│ 1   ┆ 6.0 ┆ a   ┆ x     │
        |│ 2   ┆ 7.0 ┆ b   ┆ y     │
        |│ 3   ┆ 8.0 ┆ c   ┆ null  │
        |└─────┴─────┴─────┴───────┘""")
    check(fooBarHam.join(other, on = Seq("ham"), how = "semi"),
      """shape: (2, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ f64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 6.0 ┆ a   │
        |│ 2   ┆ 7.0 ┆ b   │
        |└─────┴─────┴─────┘""")
    check(fooBarHam.join(other, on = Seq("ham"), how = "anti"),
      """shape: (1, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ f64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 3   ┆ 8.0 ┆ c   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb head(3)") {
    val df = DataFrame(Seq(
      (1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"), (4L, 9L, "d"), (5L, 10L, "e"))
      .toDF("foo", "bar", "ham"))
    check(df.head(3),
      """shape: (3, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 6   ┆ a   │
        |│ 2   ┆ 7   ┆ b   │
        |│ 3   ┆ 8   ┆ c   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb explode on a list column") {
    val df = DataFrame(Seq(
      ("a", Seq(1L)), ("a", Seq(2L, 3L)), ("b", Seq(4L, 5L)), ("c", Seq(6L, 7L, 8L)))
      .toDF("letters", "numbers"))
    check(df.explode("numbers"),
      """shape: (8, 2)
        |┌─────────┬─────────┐
        |│ letters ┆ numbers │
        |│ ---     ┆ ---     │
        |│ str     ┆ i64     │
        |╞═════════╪═════════╡
        |│ a       ┆ 1       │
        |│ a       ┆ 2       │
        |│ a       ┆ 3       │
        |│ b       ┆ 4       │
        |│ b       ┆ 5       │
        |│ c       ┆ 6       │
        |│ c       ┆ 7       │
        |│ c       ┆ 8       │
        |└─────────┴─────────┘""")
  }

  test("data_frame.rb unique (maintain_order pins the rendered row order)") {
    // the reference docstring calls plain `df.unique` and happens to print
    // first-appearance order; that order is only GUARANTEED by
    // maintain_order, which graft must spell explicitly on a shuffled engine
    val df = DataFrame(Seq(
      (1L, 0.5, true), (1L, 0.5, true), (2L, 1.0, true),
      (3L, 2.0, false), (4L, 3.0, true), (5L, 3.0, true)).toDF("a", "b", "c"))
    check(df.unique(maintainOrder = true),
      """shape: (5, 3)
        |┌─────┬─────┬───────┐
        |│ a   ┆ b   ┆ c     │
        |│ --- ┆ --- ┆ ---   │
        |│ i64 ┆ f64 ┆ bool  │
        |╞═════╪═════╪═══════╡
        |│ 1   ┆ 0.5 ┆ true  │
        |│ 2   ┆ 1.0 ┆ true  │
        |│ 3   ┆ 2.0 ┆ false │
        |│ 4   ┆ 3.0 ┆ true  │
        |│ 5   ┆ 3.0 ┆ true  │
        |└─────┴─────┴───────┘""")
  }

  test("data_frame.rb rename") {
    val df = DataFrame(Seq(
      (1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c")).toDF("foo", "bar", "ham"))
    check(df.rename(Map("foo" -> "apple")),
      """shape: (3, 3)
        |┌───────┬─────┬─────┐
        |│ apple ┆ bar ┆ ham │
        |│ ---   ┆ --- ┆ --- │
        |│ i64   ┆ i64 ┆ str │
        |╞═══════╪═════╪═════╡
        |│ 1     ┆ 6   ┆ a   │
        |│ 2     ┆ 7   ┆ b   │
        |│ 3     ┆ 8   ┆ c   │
        |└───────┴─────┴─────┘""")
  }

  test("data_frame.rb fill_null with a value") {
    val df = DataFrame(Seq[(Option[Long], Option[Double])](
      (Some(1L), Some(0.5)), (Some(2L), Some(4.0)), (None, None), (Some(4L), Some(13.0)))
      .toDF("a", "b"))
    check(df.fillNull(99),
      """shape: (4, 2)
        |┌─────┬──────┐
        |│ a   ┆ b    │
        |│ --- ┆ ---  │
        |│ i64 ┆ f64  │
        |╞═════╪══════╡
        |│ 1   ┆ 0.5  │
        |│ 2   ┆ 4.0  │
        |│ 99  ┆ 99.0 │
        |│ 4   ┆ 13.0 │
        |└─────┴──────┘""")
  }

  test("data_frame.rb vstack") {
    val df1 = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b")).toDF("foo", "bar", "ham"))
    val df2 = DataFrame(Seq((3L, 8L, "c"), (4L, 9L, "d")).toDF("foo", "bar", "ham"))
    check(df1.vstack(df2),
      """shape: (4, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 6   ┆ a   │
        |│ 2   ┆ 7   ┆ b   │
        |│ 3   ┆ 8   ┆ c   │
        |│ 4   ┆ 9   ┆ d   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb transpose with column_names keeps the i64 dtype") {
    val df = DataFrame(Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("a", "b"))
    check(df.transpose(includeHeader = false, columnNames = Seq("a", "b", "c")),
      """shape: (2, 3)
        |┌─────┬─────┬─────┐
        |│ a   ┆ b   ┆ c   │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ i64 │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 2   ┆ 3   │
        |│ 1   ┆ 2   ┆ 3   │
        |└─────┴─────┴─────┘""")
    check(df.transpose(includeHeader = true, headerName = "foo",
        columnNames = Seq("a", "b", "c")),
      """shape: (2, 4)
        |┌─────┬─────┬─────┬─────┐
        |│ foo ┆ a   ┆ b   ┆ c   │
        |│ --- ┆ --- ┆ --- ┆ --- │
        |│ str ┆ i64 ┆ i64 ┆ i64 │
        |╞═════╪═════╪═════╪═════╡
        |│ a   ┆ 1   ┆ 2   ┆ 3   │
        |│ b   ┆ 1   ┆ 2   ┆ 3   │
        |└─────┴─────┴─────┴─────┘""")
  }

  test("data_frame.rb group_by agg sum") {
    val df = DataFrame(Seq(
      ("a", 1L, 6L), ("b", 2L, 5L), ("a", 3L, 4L), ("b", 4L, 3L), ("b", 5L, 2L), ("c", 6L, 1L))
      .toDF("a", "b", "c"))
    check(df.groupBy("a").agg(Polars.col("b").sum).sort("a"),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ str ┆ i64 │
        |╞═════╪═════╡
        |│ a   ┆ 4   │
        |│ b   ┆ 11  │
        |│ c   ┆ 6   │
        |└─────┴─────┘""")
  }

  test("group_by.rb maintain_order shortcuts: first/last/max/mean") {
    val df = DataFrame(Seq(
      (1L, 0.5, true, "Apple"), (2L, 0.5, true, "Orange"), (2L, 4.0, true, "Apple"),
      (3L, 10.0, false, "Apple"), (4L, 13.0, false, "Banana"), (5L, 14.0, true, "Banana"))
      .toDF("a", "b", "c", "d"))
    check(df.groupBy(Seq("d"), maintainOrder = true).first(),
      """shape: (3, 4)
        |┌────────┬─────┬──────┬───────┐
        |│ d      ┆ a   ┆ b    ┆ c     │
        |│ ---    ┆ --- ┆ ---  ┆ ---   │
        |│ str    ┆ i64 ┆ f64  ┆ bool  │
        |╞════════╪═════╪══════╪═══════╡
        |│ Apple  ┆ 1   ┆ 0.5  ┆ true  │
        |│ Orange ┆ 2   ┆ 0.5  ┆ true  │
        |│ Banana ┆ 4   ┆ 13.0 ┆ false │
        |└────────┴─────┴──────┴───────┘""")
    check(df.groupBy(Seq("d"), maintainOrder = true).last(),
      """shape: (3, 4)
        |┌────────┬─────┬──────┬───────┐
        |│ d      ┆ a   ┆ b    ┆ c     │
        |│ ---    ┆ --- ┆ ---  ┆ ---   │
        |│ str    ┆ i64 ┆ f64  ┆ bool  │
        |╞════════╪═════╪══════╪═══════╡
        |│ Apple  ┆ 3   ┆ 10.0 ┆ false │
        |│ Orange ┆ 2   ┆ 0.5  ┆ true  │
        |│ Banana ┆ 5   ┆ 14.0 ┆ true  │
        |└────────┴─────┴──────┴───────┘""")
    check(df.groupBy(Seq("d"), maintainOrder = true).max(),
      """shape: (3, 4)
        |┌────────┬─────┬──────┬──────┐
        |│ d      ┆ a   ┆ b    ┆ c    │
        |│ ---    ┆ --- ┆ ---  ┆ ---  │
        |│ str    ┆ i64 ┆ f64  ┆ bool │
        |╞════════╪═════╪══════╪══════╡
        |│ Apple  ┆ 3   ┆ 10.0 ┆ true │
        |│ Orange ┆ 2   ┆ 0.5  ┆ true │
        |│ Banana ┆ 5   ┆ 14.0 ┆ true │
        |└────────┴─────┴──────┴──────┘""")
    check(df.groupBy(Seq("d"), maintainOrder = true).mean(),
      """shape: (3, 4)
        |┌────────┬─────┬──────────┬──────────┐
        |│ d      ┆ a   ┆ b        ┆ c        │
        |│ ---    ┆ --- ┆ ---      ┆ ---      │
        |│ str    ┆ f64 ┆ f64      ┆ f64      │
        |╞════════╪═════╪══════════╪══════════╡
        |│ Apple  ┆ 2.0 ┆ 4.833333 ┆ 0.666667 │
        |│ Orange ┆ 2.0 ┆ 0.5      ┆ 1.0      │
        |│ Banana ┆ 4.5 ┆ 13.5     ┆ 0.5      │
        |└────────┴─────┴──────────┴──────────┘""")
  }

  test("expr.rb cum_sum forward and reverse") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L).toDF("a"))
    check(df.select(
        Polars.col("a").cumSum(),
        Polars.col("a").cumSum(reverse = true).alias("a_reverse")),
      """shape: (4, 2)
        |┌─────┬───────────┐
        |│ a   ┆ a_reverse │
        |│ --- ┆ ---       │
        |│ i64 ┆ i64       │
        |╞═════╪═══════════╡
        |│ 1   ┆ 10        │
        |│ 3   ┆ 9         │
        |│ 6   ┆ 7         │
        |│ 10  ┆ 4         │
        |└─────┴───────────┘""")
  }

  test("expr.rb shift(1)") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L).toDF("foo"))
    check(df.select(Polars.col("foo").shift(1)),
      """shape: (4, 1)
        |┌──────┐
        |│ foo  │
        |│ ---  │
        |│ i64  │
        |╞══════╡
        |│ null │
        |│ 1    │
        |│ 2    │
        |│ 3    │
        |└──────┘""")
  }

  test("expr.rb rank: the 'average' method") {
    val df = DataFrame(Seq(3L, 6L, 1L, 1L, 6L).toDF("a"))
    check(df.select(Polars.col("a").rank()),
      """shape: (5, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 3.0 │
        |│ 4.5 │
        |│ 1.5 │
        |│ 1.5 │
        |│ 4.5 │
        |└─────┘""")
  }

  test("expr.rb over: windowed max and keyed sum") {
    val df = DataFrame(Seq(
      ("g1", 1L), ("g1", 2L), ("g2", 3L)).toDF("groups", "values"))
    check(df.withColumns(
        "max_by_group" -> Polars.col("values").max.over(Polars.col("groups"))),
      """shape: (3, 3)
        |┌────────┬────────┬──────────────┐
        |│ groups ┆ values ┆ max_by_group │
        |│ ---    ┆ ---    ┆ ---          │
        |│ str    ┆ i64    ┆ i64          │
        |╞════════╪════════╪══════════════╡
        |│ g1     ┆ 1      ┆ 2            │
        |│ g1     ┆ 2      ┆ 2            │
        |│ g2     ┆ 3      ┆ 3            │
        |└────────┴────────┴──────────────┘""")
    val df2 = DataFrame(Seq(
      (1L, 1L), (1L, 2L), (2L, 3L), (2L, 4L), (1L, 5L), (2L, 6L), (3L, 7L), (3L, 8L), (1L, 8L))
      .toDF("groups", "values"))
    check(df2.select(Polars.col("groups").sum.over(Polars.col("groups"))),
      """shape: (9, 1)
        |┌────────┐
        |│ groups │
        |│ ---    │
        |│ i64    │
        |╞════════╡
        |│ 4      │
        |│ 4      │
        |│ 6      │
        |│ 6      │
        |│ 4      │
        |│ 6      │
        |│ 6      │
        |│ 6      │
        |│ 4      │
        |└────────┘""")
  }

  test("expr.rb is_in against a list column") {
    val df = DataFrame(Seq(
      (Seq(1L, 2L, 3L), 1L), (Seq(1L, 2L), 2L), (Seq(9L, 10L), 3L))
      .toDF("sets", "optional_members"))
    check(df.select(
        Polars.col("optional_members").isIn(Polars.col("sets")).alias("contains")),
      """shape: (3, 1)
        |┌──────────┐
        |│ contains │
        |│ ---      │
        |│ bool     │
        |╞══════════╡
        |│ true     │
        |│ true     │
        |│ false    │
        |└──────────┘""")
  }

  test("expr.rb diff") {
    val df = DataFrame(Seq(20L, 10L, 30L).toDF("a"))
    check(df.select(Polars.col("a").diff()),
      """shape: (3, 1)
        |┌──────┐
        |│ a    │
        |│ ---  │
        |│ i64  │
        |╞══════╡
        |│ null │
        |│ -10  │
        |│ 20   │
        |└──────┘""")
  }

  test("data_frame.rb with_columns: expr alias adds; same-name cast replaces in place") {
    val df = DataFrame(Seq(
      (1L, 0.5, true), (2L, 4.0, true), (3L, 10.0, false), (4L, 13.0, true))
      .toDF("a", "b", "c"))
    check(df.withColumns(Seq((Polars.col("a") pow 2).cast(
        org.apache.spark.sql.types.LongType).alias("a^2"))),
      """shape: (4, 4)
        |┌─────┬──────┬───────┬─────┐
        |│ a   ┆ b    ┆ c     ┆ a^2 │
        |│ --- ┆ ---  ┆ ---   ┆ --- │
        |│ i64 ┆ f64  ┆ bool  ┆ i64 │
        |╞═════╪══════╪═══════╪═════╡
        |│ 1   ┆ 0.5  ┆ true  ┆ 1   │
        |│ 2   ┆ 4.0  ┆ true  ┆ 4   │
        |│ 3   ┆ 10.0 ┆ false ┆ 9   │
        |│ 4   ┆ 13.0 ┆ true  ┆ 16  │
        |└─────┴──────┴───────┴─────┘""")
    check(df.withColumns(Seq(
        Polars.col("a").cast(org.apache.spark.sql.types.DoubleType))),
      """shape: (4, 3)
        |┌─────┬──────┬───────┐
        |│ a   ┆ b    ┆ c     │
        |│ --- ┆ ---  ┆ ---   │
        |│ f64 ┆ f64  ┆ bool  │
        |╞═════╪══════╪═══════╡
        |│ 1.0 ┆ 0.5  ┆ true  │
        |│ 2.0 ┆ 4.0  ┆ true  │
        |│ 3.0 ┆ 10.0 ┆ false │
        |│ 4.0 ┆ 13.0 ┆ true  │
        |└─────┴──────┴───────┘""")
  }

  test("expr.rb is_between: both (default) and closed left") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L, 5L).toDF("num"))
    check(df.withColumns(Seq(
        Polars.col("num").isBetween(2, 4).alias("is_between"))),
      """shape: (5, 2)
        |┌─────┬────────────┐
        |│ num ┆ is_between │
        |│ --- ┆ ---        │
        |│ i64 ┆ bool       │
        |╞═════╪════════════╡
        |│ 1   ┆ false      │
        |│ 2   ┆ true       │
        |│ 3   ┆ true       │
        |│ 4   ┆ true       │
        |│ 5   ┆ false      │
        |└─────┴────────────┘""")
    check(df.withColumns(Seq(
        Polars.col("num").isBetween(2, 4, closed = "left").alias("is_between"))),
      """shape: (5, 2)
        |┌─────┬────────────┐
        |│ num ┆ is_between │
        |│ --- ┆ ---        │
        |│ i64 ┆ bool       │
        |╞═════╪════════════╡
        |│ 1   ┆ false      │
        |│ 2   ┆ true       │
        |│ 3   ┆ true       │
        |│ 4   ┆ false      │
        |│ 5   ┆ false      │
        |└─────┴────────────┘""")
  }

  test("expr.rb abs / floor / round(1)") {
    check(DataFrame(Seq(-1.0, 0.0, 1.0, 2.0).toDF("A"))
        .select(Polars.col("A").abs),
      """shape: (4, 1)
        |┌─────┐
        |│ A   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 1.0 │
        |│ 0.0 │
        |│ 1.0 │
        |│ 2.0 │
        |└─────┘""")
    check(DataFrame(Seq(0.3, 0.5, 1.0, 1.1).toDF("a"))
        .select(Polars.col("a").floor),
      """shape: (4, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 0.0 │
        |│ 0.0 │
        |│ 1.0 │
        |│ 1.0 │
        |└─────┘""")
    check(DataFrame(Seq(0.33, 0.52, 1.02, 1.17).toDF("a"))
        .select(Polars.col("a").round(1)),
      """shape: (4, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 0.3 │
        |│ 0.5 │
        |│ 1.0 │
        |│ 1.2 │
        |└─────┘""")
  }

  test("expr.rb clip keeps nulls") {
    val df = DataFrame(Seq[(java.lang.Long, Long)](
      (-50L, 0L), (5L, 1L), (null, 2L), (50L, 3L)).toDF("foo", "i")
      .select(F.col("foo")))
    check(df.withColumns(Seq(Polars.col("foo").clip(1, 10).alias("foo_clipped"))),
      """shape: (4, 2)
        |┌──────┬─────────────┐
        |│ foo  ┆ foo_clipped │
        |│ ---  ┆ ---         │
        |│ i64  ┆ i64         │
        |╞══════╪═════════════╡
        |│ -50  ┆ 1           │
        |│ 5    ┆ 5           │
        |│ null ┆ null        │
        |│ 50   ┆ 10          │
        |└──────┴─────────────┘""")
  }

  test("as_datatype.rb concat_str propagates nulls with sep") {
    val df = DataFrame(Seq[(Long, String, String)](
      (1L, "dogs", "play"), (2L, "cats", "swim"), (3L, null, "walk"))
      .toDF("a", "b", "c"))
    check(df.withColumns(Seq(
        Polars.concatStr(Seq(Polars.col("a") * 2, Polars.col("b"), Polars.col("c")),
          separator = " ").alias("full_sentence"))),
      """shape: (3, 4)
        |┌─────┬──────┬──────┬───────────────┐
        |│ a   ┆ b    ┆ c    ┆ full_sentence │
        |│ --- ┆ ---  ┆ ---  ┆ ---           │
        |│ i64 ┆ str  ┆ str  ┆ str           │
        |╞═════╪══════╪══════╪═══════════════╡
        |│ 1   ┆ dogs ┆ play ┆ 2 dogs play   │
        |│ 2   ┆ cats ┆ swim ┆ 4 cats swim   │
        |│ 3   ┆ null ┆ walk ┆ null          │
        |└─────┴──────┴──────┴───────────────┘""")
  }

  test("string_expr.rb to_uppercase") {
    val df = DataFrame(Seq("cat", "dog").toDF("foo"))
    check(df.select(Polars.col("foo").str.toUppercase),
      """shape: (2, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ str │
        |╞═════╡
        |│ CAT │
        |│ DOG │
        |└─────┘""")
  }

  test("string_expr.rb contains: regex and literal") {
    val df = DataFrame(Seq(
      Option("Crab"), Option("cat and dog"), Option("rab$bit"), None).toDF("a"))
    check(df.select(
        Polars.col("a"),
        Polars.col("a").str.contains("cat|bit").alias("regex"),
        Polars.col("a").str.contains("rab$", literal = true).alias("literal")),
      """shape: (4, 3)
        |┌─────────────┬───────┬─────────┐
        |│ a           ┆ regex ┆ literal │
        |│ ---         ┆ ---   ┆ ---     │
        |│ str         ┆ bool  ┆ bool    │
        |╞═════════════╪═══════╪═════════╡
        |│ Crab        ┆ false ┆ false   │
        |│ cat and dog ┆ true  ┆ false   │
        |│ rab$bit     ┆ true  ┆ true    │
        |│ null        ┆ null  ┆ null    │
        |└─────────────┴───────┴─────────┘""")
  }

  test("string_expr.rb starts_with: column and filter") {
    val df = DataFrame(Seq(Option("apple"), Option("mango"), None).toDF("fruits"))
    check(df.withColumns(
        "has_prefix" -> Polars.col("fruits").str.startsWith("app")),
      """shape: (3, 2)
        |┌────────┬────────────┐
        |│ fruits ┆ has_prefix │
        |│ ---    ┆ ---        │
        |│ str    ┆ bool       │
        |╞════════╪════════════╡
        |│ apple  ┆ true       │
        |│ mango  ┆ false      │
        |│ null   ┆ null       │
        |└────────┴────────────┘""")
    check(df.filter(Polars.col("fruits").str.startsWith("app")),
      """shape: (1, 1)
        |┌────────┐
        |│ fruits │
        |│ ---    │
        |│ str    │
        |╞════════╡
        |│ apple  │
        |└────────┘""")
  }

  test("date_time_expr.rb year/iso_year") {
    val df = DataFrame(Seq("1977-01-01", "1978-01-01", "1979-01-01").toDF("s")
      .select(F.to_date(F.col("s")).as("date")))
    check(df.withColumns(
        "calendar_year" -> Polars.col("date").dt.year,
        "iso_year" -> Polars.col("date").dt.isoYear),
      """shape: (3, 3)
        |┌────────────┬───────────────┬──────────┐
        |│ date       ┆ calendar_year ┆ iso_year │
        |│ ---        ┆ ---           ┆ ---      │
        |│ date       ┆ i32           ┆ i32      │
        |╞════════════╪═══════════════╪══════════╡
        |│ 1977-01-01 ┆ 1977          ┆ 1976     │
        |│ 1978-01-01 ┆ 1978          ┆ 1977     │
        |│ 1979-01-01 ┆ 1979          ┆ 1979     │
        |└────────────┴───────────────┴──────────┘""")
  }

  test("date_time_expr.rb month is i8") {
    val df = DataFrame(Seq("2001-01-01", "2001-06-30", "2001-12-27").toDF("s")
      .select(F.to_date(F.col("s")).as("date")))
    check(df.withColumns("month" -> Polars.col("date").dt.month),
      """shape: (3, 2)
        |┌────────────┬───────┐
        |│ date       ┆ month │
        |│ ---        ┆ ---   │
        |│ date       ┆ i8    │
        |╞════════════╪═══════╡
        |│ 2001-01-01 ┆ 1     │
        |│ 2001-06-30 ┆ 6     │
        |│ 2001-12-27 ┆ 12    │
        |└────────────┴───────┘""")
  }

  test("date_time_expr.rb weekday/day/ordinal_day dtypes") {
    val df = DataFrame(Seq("2001-12-22", "2001-12-23", "2001-12-24", "2001-12-25")
      .toDF("s").select(F.to_date(F.col("s")).as("date")))
    check(df.withColumns(
        "weekday" -> Polars.col("date").dt.weekday,
        "day_of_month" -> Polars.col("date").dt.day,
        "day_of_year" -> Polars.col("date").dt.ordinalDay),
      """shape: (4, 4)
        |┌────────────┬─────────┬──────────────┬─────────────┐
        |│ date       ┆ weekday ┆ day_of_month ┆ day_of_year │
        |│ ---        ┆ ---     ┆ ---          ┆ ---         │
        |│ date       ┆ i8      ┆ i8           ┆ i16         │
        |╞════════════╪═════════╪══════════════╪═════════════╡
        |│ 2001-12-22 ┆ 6       ┆ 22           ┆ 356         │
        |│ 2001-12-23 ┆ 7       ┆ 23           ┆ 357         │
        |│ 2001-12-24 ┆ 1       ┆ 24           ┆ 358         │
        |│ 2001-12-25 ┆ 2       ┆ 25           ┆ 359         │
        |└────────────┴─────────┴──────────────┴─────────────┘""")
  }

  test("list_expr.rb sum keeps the element dtype; max") {
    val df = DataFrame(Seq(Seq(1L), Seq(2L, 3L)).toDF("values"))
    check(df.select(Polars.col("values").list.sum),
      """shape: (2, 1)
        |┌────────┐
        |│ values │
        |│ ---    │
        |│ i64    │
        |╞════════╡
        |│ 1      │
        |│ 5      │
        |└────────┘""")
    check(df.select(Polars.col("values").list.max),
      """shape: (2, 1)
        |┌────────┐
        |│ values │
        |│ ---    │
        |│ i64    │
        |╞════════╡
        |│ 1      │
        |│ 3      │
        |└────────┘""")
  }

  test("list_expr.rb reverse and sort") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq(9L, 1L, 2L)).toDF("a"))
    check(df.select(Polars.col("a").list.reverse),
      """shape: (2, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ list[i64] │
        |╞═══════════╡
        |│ [1, 2, 3] │
        |│ [2, 1, 9] │
        |└───────────┘""")
    check(df.select(Polars.col("a").list.sort()),
      """shape: (2, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ list[i64] │
        |╞═══════════╡
        |│ [1, 2, 3] │
        |│ [1, 2, 9] │
        |└───────────┘""")
  }

  test("list_expr.rb get(0) with an empty list; join") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq.empty[Long], Seq(1L, 2L)).toDF("foo"))
    check(df.select(Polars.col("foo").list.get(0)),
      """shape: (3, 1)
        |┌──────┐
        |│ foo  │
        |│ ---  │
        |│ i64  │
        |╞══════╡
        |│ 3    │
        |│ null │
        |│ 1    │
        |└──────┘""")
    val s = DataFrame(Seq(Seq("a", "b", "c"), Seq("x", "y")).toDF("s"))
    check(s.select(Polars.col("s").list.join(" ")),
      """shape: (2, 1)
        |┌───────┐
        |│ s     │
        |│ ---   │
        |│ str   │
        |╞═══════╡
        |│ a b c │
        |│ x y   │
        |└───────┘""")
  }

  test("string_expr.rb slice(-3)") {
    val df = DataFrame(Seq(
      Option("pear"), None, Option("papaya"), Option("dragonfruit")).toDF("s"))
    check(df.withColumns("s_sliced" -> Polars.col("s").str.slice(-3)),
      """shape: (4, 2)
        |┌─────────────┬──────────┐
        |│ s           ┆ s_sliced │
        |│ ---         ┆ ---      │
        |│ str         ┆ str      │
        |╞═════════════╪══════════╡
        |│ pear        ┆ ear      │
        |│ null        ┆ null     │
        |│ papaya      ┆ aya      │
        |│ dragonfruit ┆ uit      │
        |└─────────────┴──────────┘""")
  }
}
