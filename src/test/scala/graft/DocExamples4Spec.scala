package graft

import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** Round-12 tranche 3 of the reference `@example` golden corpus: expr.rb
  * math/aggregate/selection depth plus data_frame.rb frame ops. Verbatim
  * expected renders, same rules as DocExamplesSpec. The extrema and
  * empty-sum blocks pin the two polars semantics this tranche surfaced:
  * max/min IGNORE NaN (expr.rb:1895-1935) and an empty filtered group sums
  * to 0, not null (expr.rb:2713). */
class DocExamples4Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  private def checkS(s: graft.api.Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  // ---- expr.rb math ----

  test("expr.rb sqrt / log10 / exp") {
    val df = DataFrame(Seq(1.0, 2.0, 4.0).toDF("values"))
    check(df.select(col("values").sqrt),
      """shape: (3, 1)
        |┌──────────┐
        |│ values   │
        |│ ---      │
        |│ f64      │
        |╞══════════╡
        |│ 1.0      │
        |│ 1.414214 │
        |│ 2.0      │
        |└──────────┘""")
    check(df.select(col("values").log10),
      """shape: (3, 1)
        |┌─────────┐
        |│ values  │
        |│ ---     │
        |│ f64     │
        |╞═════════╡
        |│ 0.0     │
        |│ 0.30103 │
        |│ 0.60206 │
        |└─────────┘""")
    check(df.select(col("values").exp),
      """shape: (3, 1)
        |┌──────────┐
        |│ values   │
        |│ ---      │
        |│ f64      │
        |╞══════════╡
        |│ 2.718282 │
        |│ 7.389056 │
        |│ 54.59815 │
        |└──────────┘""")
  }

  test("expr.rb cum_prod / cum_min / cum_max forward and reverse") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L).toDF("a"))
    check(df.select(col("a").cumProd(), col("a").cumProd(reverse = true).alias("a_reverse")),
      """shape: (4, 2)
        |┌─────┬───────────┐
        |│ a   ┆ a_reverse │
        |│ --- ┆ ---       │
        |│ i64 ┆ i64       │
        |╞═════╪═══════════╡
        |│ 1   ┆ 24        │
        |│ 2   ┆ 24        │
        |│ 6   ┆ 12        │
        |│ 24  ┆ 4         │
        |└─────┴───────────┘""")
    check(df.select(col("a").cumMin(), col("a").cumMin(reverse = true).alias("a_reverse")),
      """shape: (4, 2)
        |┌─────┬───────────┐
        |│ a   ┆ a_reverse │
        |│ --- ┆ ---       │
        |│ i64 ┆ i64       │
        |╞═════╪═══════════╡
        |│ 1   ┆ 1         │
        |│ 1   ┆ 2         │
        |│ 1   ┆ 3         │
        |│ 1   ┆ 4         │
        |└─────┴───────────┘""")
    check(df.select(col("a").cumMax(), col("a").cumMax(reverse = true).alias("a_reverse")),
      """shape: (4, 2)
        |┌─────┬───────────┐
        |│ a   ┆ a_reverse │
        |│ --- ┆ ---       │
        |│ i64 ┆ i64       │
        |╞═════╪═══════════╡
        |│ 1   ┆ 4         │
        |│ 2   ┆ 4         │
        |│ 3   ┆ 4         │
        |│ 4   ┆ 4         │
        |└─────┴───────────┘""")
  }

  test("expr.rb cast: a to f64, b to i32") {
    val df = DataFrame(Seq((1L, "4"), (2L, "5"), (3L, "6")).toDF("a", "b"))
    check(df.withColumns(Seq(col("a").cast(DoubleType), col("b").cast(IntegerType))),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ f64 ┆ i32 │
        |╞═════╪═════╡
        |│ 1.0 ┆ 4   │
        |│ 2.0 ┆ 5   │
        |│ 3.0 ┆ 6   │
        |└─────┴─────┘""")
  }

  // ---- expr.rb extrema semantics ----

  test("expr.rb max / min ignore NaN; nan_max propagates") {
    val df = DataFrame(Seq(-1.0, Double.NaN, 1.0).toDF("a"))
    check(df.select(col("a").max),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 1.0 │
        |└─────┘""")
    check(df.select(col("a").min),
      """shape: (1, 1)
        |┌──────┐
        |│ a    │
        |│ ---  │
        |│ f64  │
        |╞══════╡
        |│ -1.0 │
        |└──────┘""")
  }

  test("expr.rb filter inside agg: the empty filtered group sums to 0") {
    val df = DataFrame(Seq(("g1", 1L), ("g1", 2L), ("g2", 3L)).toDF("group_col", "b"))
    check(df.groupBy("group_col").agg(
      col("b").filter(col("b") < 2).sum.alias("lt"),
      col("b").filter(col("b") >= 2).sum.alias("gte")).sort("group_col"),
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

  // ---- expr.rb aggregates / selection ----

  test("expr.rb first / last / product / sum / mean / var") {
    val df = DataFrame(Seq(1L, 1L, 2L).toDF("a"))
    check(df.select(col("a").first),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ i64 │\n╞═════╡\n│ 1   │\n└─────┘")
    check(df.select(col("a").last),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ i64 │\n╞═════╡\n│ 2   │\n└─────┘")
    val df2 = DataFrame(Seq(1L, 2L, 3L).toDF("a"))
    check(df2.select(col("a").product),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ i64 │\n╞═════╡\n│ 6   │\n└─────┘")
    val df3 = DataFrame(Seq(-1L, 0L, 1L).toDF("a"))
    check(df3.select(col("a").sum),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ i64 │\n╞═════╡\n│ 0   │\n└─────┘")
    check(df3.select(col("a").mean),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ f64 │\n╞═════╡\n│ 0.0 │\n└─────┘")
    check(df3.select(col("a").variance()),
      "shape: (1, 1)\n┌─────┐\n│ a   │\n│ --- │\n│ f64 │\n╞═════╡\n│ 1.0 │\n└─────┘")
  }

  test("expr.rb explode / gather_every / tail") {
    val dfl = DataFrame(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)).toDF("b"))
    check(dfl.select(col("b").explode),
      """shape: (6, 1)
        |┌─────┐
        |│ b   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |│ 2   │
        |│ 3   │
        |│ 4   │
        |│ 5   │
        |│ 6   │
        |└─────┘""")
    val df9 = DataFrame((1L to 9L).toDF("foo"))
    check(df9.gatherEvery(3),
      """shape: (3, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |│ 4   │
        |│ 7   │
        |└─────┘""")
    val df7 = DataFrame((1L to 7L).toDF("foo"))
    check(df7.tail(3),
      """shape: (3, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 5   │
        |│ 6   │
        |│ 7   │
        |└─────┘""")
  }

  test("expr.rb eq_missing: null == null is true, eq propagates null") {
    val df = DataFrame(Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(2.0)), (Some(2.0), Some(2.0)),
      (Some(Double.NaN), Some(Double.NaN)), (Some(4.0), Some(4.0)),
      (None, Some(5.0)), (None, None)).toDF("x", "y"))
    check(df.withColumns(Seq(
      col("x").eq(col("y")).alias("x eq y"),
      col("x").eqMissing(col("y")).alias("x eq_missing y"))),
      """shape: (6, 4)
        |┌──────┬──────┬────────┬────────────────┐
        |│ x    ┆ y    ┆ x eq y ┆ x eq_missing y │
        |│ ---  ┆ ---  ┆ ---    ┆ ---            │
        |│ f64  ┆ f64  ┆ bool   ┆ bool           │
        |╞══════╪══════╪════════╪════════════════╡
        |│ 1.0  ┆ 2.0  ┆ false  ┆ false          │
        |│ 2.0  ┆ 2.0  ┆ true   ┆ true           │
        |│ NaN  ┆ NaN  ┆ true   ┆ true           │
        |│ 4.0  ┆ 4.0  ┆ true   ┆ true           │
        |│ null ┆ 5.0  ┆ null   ┆ false          │
        |│ null ┆ null ┆ null   ┆ true           │
        |└──────┴──────┴────────┴────────────────┘""")
  }

  test("expr.rb ge: NaN >= NaN is true") {
    val df = DataFrame(Seq((5.0, 5.0), (4.0, 3.0),
      (Double.NaN, Double.NaN), (2.0, 1.0)).toDF("x", "y"))
    check(df.withColumns(Seq(col("x").ge(col("y")).alias("x >= y"))),
      """shape: (4, 3)
        |┌─────┬─────┬────────┐
        |│ x   ┆ y   ┆ x >= y │
        |│ --- ┆ --- ┆ ---    │
        |│ f64 ┆ f64 ┆ bool   │
        |╞═════╪═════╪════════╡
        |│ 5.0 ┆ 5.0 ┆ true   │
        |│ 4.0 ┆ 3.0 ┆ true   │
        |│ NaN ┆ NaN ┆ true   │
        |│ 2.0 ┆ 1.0 ┆ true   │
        |└─────┴─────┴────────┘""")
  }

  test("expr.rb add: int literal and cum_prod expression operands") {
    val df = DataFrame((1L to 5L).toDF("x"))
    check(df.withColumns(Seq(
      col("x").add(2).alias("x+int"),
      col("x").add(col("x").cumProd()).alias("x+expr"))),
      """shape: (5, 3)
        |┌─────┬───────┬────────┐
        |│ x   ┆ x+int ┆ x+expr │
        |│ --- ┆ ---   ┆ ---    │
        |│ i64 ┆ i64   ┆ i64    │
        |╞═════╪═══════╪════════╡
        |│ 1   ┆ 3     ┆ 2      │
        |│ 2   ┆ 4     ┆ 4      │
        |│ 3   ┆ 5     ┆ 9      │
        |│ 4   ┆ 6     ┆ 28     │
        |│ 5   ┆ 7     ┆ 125    │
        |└─────┴───────┴────────┘""")
  }

  // ---- data_frame.rb frame ops ----

  test("data_frame.rb reverse") {
    val df = DataFrame(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("key", "val"))
    check(df.reverse,
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ key ┆ val │
        |│ --- ┆ --- │
        |│ str ┆ i64 │
        |╞═════╪═════╡
        |│ c   ┆ 3   │
        |│ b   ┆ 2   │
        |│ a   ┆ 1   │
        |└─────┴─────┘""")
  }

  test("data_frame.rb limit(4)") {
    val df = DataFrame(Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "d"), (5L, "e"), (6L, "f")).toDF("foo", "bar"))
    check(df.limit(4),
      """shape: (4, 2)
        |┌─────┬─────┐
        |│ foo ┆ bar │
        |│ --- ┆ --- │
        |│ i64 ┆ str │
        |╞═════╪═════╡
        |│ 1   ┆ a   │
        |│ 2   ┆ b   │
        |│ 3   ┆ c   │
        |│ 4   ┆ d   │
        |└─────┴─────┘""")
  }

  test("data_frame.rb is_duplicated / is_unique render as unnamed bool Series") {
    val df = DataFrame(Seq((1L, "x"), (2L, "y"), (3L, "z"), (1L, "x")).toDF("a", "b"))
    checkS(df.isDuplicatedRows.rename(""),
      "shape: (4,)\nSeries: '' [bool]\n[\n\ttrue\n\tfalse\n\tfalse\n\ttrue\n]")
    checkS(df.isUniqueRows.rename(""),
      "shape: (4,)\nSeries: '' [bool]\n[\n\tfalse\n\ttrue\n\ttrue\n\tfalse\n]")
  }
}
