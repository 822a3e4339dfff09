package graft

import graft.Polars._
import graft.api.DataFrame
import graft.testing.Testing

/** Round-14 tranche 14 of the reference `@example` golden corpus — expr.rb
  * blocks with no prior port: predicate family (is_finite/is_nan/is_not),
  * ne_missing NaN/null semantics, truediv inf/NaN division, clip_max null
  * propagation, replace forms, pow dtypes, interpolate NaN passthrough,
  * pct_change forward-fill, fill_nan string promotion, search_sorted,
  * agg_groups, cum_count, rle_id, null_count, to_physical. Unsigned count
  * headers (u32) render as i64 per SURVEY §1.2 — values are verbatim. */
class DocExamples15Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("expr.rb is_finite (expr.rb golden)") {
    val df = DataFrame(Seq((1.0, 3.0), (2.0, Double.PositiveInfinity)).toDF("A", "B"))
    check(df.select(col("A").isFinite, col("B").isFinite),
      """shape: (2, 2)
        |┌──────┬───────┐
        |│ A    ┆ B     │
        |│ ---  ┆ ---   │
        |│ bool ┆ bool  │
        |╞══════╪═══════╡
        |│ true ┆ true  │
        |│ true ┆ false │
        |└──────┴───────┘""")
  }

  test("expr.rb is_nan: NaN is a value, null is missing") {
    val df = DataFrame(Seq(
      (Some(1L), 1.0), (Some(2L), 2.0), (None, Double.NaN), (Some(1L), 1.0), (Some(5L), 5.0))
      .toDF("a", "b"))
    check(df.withColumn("b_isnan", col("b").isNan),
      """shape: (5, 3)
        |┌──────┬─────┬─────────┐
        |│ a    ┆ b   ┆ b_isnan │
        |│ ---  ┆ --- ┆ ---     │
        |│ i64  ┆ f64 ┆ bool    │
        |╞══════╪═════╪═════════╡
        |│ 1    ┆ 1.0 ┆ false   │
        |│ 2    ┆ 2.0 ┆ false   │
        |│ null ┆ NaN ┆ true    │
        |│ 1    ┆ 1.0 ┆ false   │
        |│ 5    ┆ 5.0 ┆ false   │
        |└──────┴─────┴─────────┘""")
  }

  test("expr.rb is_not: boolean negation") {
    val df = DataFrame(Seq(true, false, false).toDF("a"))
    check(df.select(col("a").isNot),
      """shape: (3, 1)
        |┌───────┐
        |│ a     │
        |│ ---   │
        |│ bool  │
        |╞═══════╡
        |│ false │
        |│ true  │
        |│ true  │
        |└───────┘""")
  }

  test("expr.rb null_count (u32 renders i64 per §1.2)") {
    val df = DataFrame(Seq((Option.empty[Long], 1L), (Some(1L), 2L), (None, 3L)).toDF("a", "b"))
    check(df.select(col("a").nullCount, col("b").nullCount),
      """shape: (1, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 2   ┆ 0   │
        |└─────┴─────┘""")
  }

  test("expr.rb ne_missing: NaN == NaN, null-safe inequality (expr.rb golden)") {
    val rows = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 2.0), (2.0, 2.0), (Double.NaN, Double.NaN), (4.0, 4.0), (null, 5.0), (null, null))
    val df = DataFrame(rows.toDF("x", "y"))
    check(df.withColumns(Seq(
      col("x").ne(col("y")).alias("x ne y"),
      col("x").neMissing(col("y")).alias("x ne_missing y"))),
      """shape: (6, 4)
        |┌──────┬──────┬────────┬────────────────┐
        |│ x    ┆ y    ┆ x ne y ┆ x ne_missing y │
        |│ ---  ┆ ---  ┆ ---    ┆ ---            │
        |│ f64  ┆ f64  ┆ bool   ┆ bool           │
        |╞══════╪══════╪════════╪════════════════╡
        |│ 1.0  ┆ 2.0  ┆ true   ┆ true           │
        |│ 2.0  ┆ 2.0  ┆ false  ┆ false          │
        |│ NaN  ┆ NaN  ┆ false  ┆ false          │
        |│ 4.0  ┆ 4.0  ┆ false  ┆ false          │
        |│ null ┆ 5.0  ┆ null   ┆ true           │
        |│ null ┆ null ┆ null   ┆ false          │
        |└──────┴──────┴────────┴────────────────┘""")
  }

  test("expr.rb truediv: int/int is f64; 1/0 is inf, 0/0 is NaN (expr.rb golden)") {
    val df = DataFrame(Seq((-2L, 0.5), (-1L, 0.0), (0L, 0.0), (1L, -4.0), (2L, -0.5))
      .toDF("x", "y"))
    check(df.withColumns(Seq(
      col("x").truediv(lit(2)).alias("x/2"),
      col("x").truediv(col("y")).alias("x/y"))),
      """shape: (5, 4)
        |┌─────┬──────┬──────┬───────┐
        |│ x   ┆ y    ┆ x/2  ┆ x/y   │
        |│ --- ┆ ---  ┆ ---  ┆ ---   │
        |│ i64 ┆ f64  ┆ f64  ┆ f64   │
        |╞═════╪══════╪══════╪═══════╡
        |│ -2  ┆ 0.5  ┆ -1.0 ┆ -4.0  │
        |│ -1  ┆ 0.0  ┆ -0.5 ┆ -inf  │
        |│ 0   ┆ 0.0  ┆ 0.0  ┆ NaN   │
        |│ 1   ┆ -4.0 ┆ 0.5  ┆ -0.25 │
        |│ 2   ┆ -0.5 ┆ 1.0  ┆ -4.0  │
        |└─────┴──────┴──────┴───────┘""")
  }

  test("expr.rb clip_max keeps nulls and the dtype (expr.rb golden)") {
    val df = DataFrame(Seq(Some(-50L), Some(5L), None, Some(50L)).toDF("foo"))
    check(df.withColumn("foo_clipped", col("foo").clipMax(0)),
      """shape: (4, 2)
        |┌──────┬─────────────┐
        |│ foo  ┆ foo_clipped │
        |│ ---  ┆ ---         │
        |│ i64  ┆ i64         │
        |╞══════╪═════════════╡
        |│ -50  ┆ -50         │
        |│ 5    ┆ 0           │
        |│ null ┆ null        │
        |│ 50   ┆ 0           │
        |└──────┴─────────────┘""")
  }

  test("expr.rb replace: single value and sequence forms keep unmatched values") {
    val df = DataFrame(Seq(1L, 2L, 2L, 3L).toDF("a"))
    check(df.withColumn("replaced", col("a").replaceValues(Map(2 -> 100))),
      """shape: (4, 2)
        |┌─────┬──────────┐
        |│ a   ┆ replaced │
        |│ --- ┆ ---      │
        |│ i64 ┆ i64      │
        |╞═════╪══════════╡
        |│ 1   ┆ 1        │
        |│ 2   ┆ 100      │
        |│ 2   ┆ 100      │
        |│ 3   ┆ 3        │
        |└─────┴──────────┘""")
    check(df.withColumn("replaced", col("a").replaceValues(Map(2 -> 100, 3 -> 200))),
      """shape: (4, 2)
        |┌─────┬──────────┐
        |│ a   ┆ replaced │
        |│ --- ┆ ---      │
        |│ i64 ┆ i64      │
        |╞═════╪══════════╡
        |│ 1   ┆ 1        │
        |│ 2   ┆ 100      │
        |│ 2   ┆ 100      │
        |│ 3   ┆ 200      │
        |└─────┴──────────┘""")
  }

  test("expr.rb pow: integer base and exponent stays i64, float exponent f64 (expr.rb golden)") {
    val df = DataFrame(Seq(1L, 2L, 4L, 8L).toDF("x"))
    check(df.withColumns(Seq(
      col("x").pow(3).alias("cube"),
      col("x").pow(col("x").log(2)).alias("x ** xlog2"))),
      """shape: (4, 3)
        |┌─────┬──────┬────────────┐
        |│ x   ┆ cube ┆ x ** xlog2 │
        |│ --- ┆ ---  ┆ ---        │
        |│ i64 ┆ i64  ┆ f64        │
        |╞═════╪══════╪════════════╡
        |│ 1   ┆ 1    ┆ 1.0        │
        |│ 2   ┆ 8    ┆ 2.0        │
        |│ 4   ┆ 64   ┆ 16.0       │
        |│ 8   ┆ 512  ┆ 512.0      │
        |└─────┴──────┴────────────┘""")
  }

  test("expr.rb interpolate: ints promote to f64, NaN passes through (expr.rb golden)") {
    val df = DataFrame(Seq[(Option[Long], Double)](
      (Some(1L), 1.0), (None, Double.NaN), (Some(3L), 3.0)).toDF("a", "b"))
    check(df.select(col("a").interpolate().alias("a"), col("b").interpolate().alias("b")),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ f64 ┆ f64 │
        |╞═════╪═════╡
        |│ 1.0 ┆ 1.0 │
        |│ 2.0 ┆ NaN │
        |│ 3.0 ┆ 3.0 │
        |└─────┴─────┘""")
  }

  test("expr.rb pct_change forward-fills before differencing (expr.rb golden)") {
    val df = DataFrame(Seq(Some(10L), Some(11L), Some(12L), None, Some(12L)).toDF("a"))
    check(df.withColumn("pct_change", col("a").pctChange()),
      """shape: (5, 2)
        |┌──────┬────────────┐
        |│ a    ┆ pct_change │
        |│ ---  ┆ ---        │
        |│ i64  ┆ f64        │
        |╞══════╪════════════╡
        |│ 10   ┆ null       │
        |│ 11   ┆ 0.1        │
        |│ 12   ┆ 0.090909   │
        |│ null ┆ 0.0        │
        |│ 12   ┆ 0.0        │
        |└──────┴────────────┘""")
  }

  test("expr.rb fill_nan with a string promotes float columns to str (expr.rb golden)") {
    val df = DataFrame(Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 4.0), (null, Double.NaN), (Double.NaN, 6.0)).toDF("a", "b"))
    check(df.fillNan(lit("zero")),
      """shape: (3, 2)
        |┌──────┬──────┐
        |│ a    ┆ b    │
        |│ ---  ┆ ---  │
        |│ str  ┆ str  │
        |╞══════╪══════╡
        |│ 1.0  ┆ 4.0  │
        |│ null ┆ zero │
        |│ zero ┆ 6.0  │
        |└──────┴──────┘""")
  }

  test("expr.rb search_sorted: insertion points (u32 renders i64 per §1.2)") {
    val df = DataFrame(Seq(1L, 2L, 3L, 5L).toDF("values"))
    check(df.select(
      col("values").searchSorted(0).alias("zero"),
      col("values").searchSorted(3).alias("three"),
      col("values").searchSorted(6).alias("six")),
      """shape: (1, 3)
        |┌──────┬───────┬─────┐
        |│ zero ┆ three ┆ six │
        |│ ---  ┆ ---   ┆ --- │
        |│ i64  ┆ i64   ┆ i64 │
        |╞══════╪═══════╪═════╡
        |│ 0    ┆ 2     ┆ 4   │
        |└──────┴───────┴─────┘""")
  }

  test("expr.rb agg_groups: per-group row indexes (list[u32] renders list[i64])") {
    val df = DataFrame(Seq(
      ("one", 94L), ("one", 95L), ("one", 96L), ("two", 97L), ("two", 97L), ("two", 99L))
      .toDF("group", "value"))
    check(df.groupBy(Seq("group"), maintainOrder = true).agg(col("value").aggGroups),
      """shape: (2, 2)
        |┌───────┬───────────┐
        |│ group ┆ value     │
        |│ ---   ┆ ---       │
        |│ str   ┆ list[i64] │
        |╞═══════╪═══════════╡
        |│ one   ┆ [0, 1, 2] │
        |│ two   ┆ [3, 4, 5] │
        |└───────┴───────────┘""")
  }

  test("expr.rb cum_count skips nulls, forward and reverse (u32 renders i64)") {
    val df = DataFrame(Seq(Some("x"), Some("k"), None, Some("d")).toDF("a"))
    check(df.withColumns(Seq(
      col("a").cumCount().alias("cum_count"),
      col("a").cumCount(reverse = true).alias("cum_count_reverse"))),
      """shape: (4, 3)
        |┌──────┬───────────┬───────────────────┐
        |│ a    ┆ cum_count ┆ cum_count_reverse │
        |│ ---  ┆ ---       ┆ ---               │
        |│ str  ┆ i64       ┆ i64               │
        |╞══════╪═══════════╪═══════════════════╡
        |│ x    ┆ 1         ┆ 3                 │
        |│ k    ┆ 2         ┆ 2                 │
        |│ null ┆ 2         ┆ 1                 │
        |│ d    ┆ 3         ┆ 1                 │
        |└──────┴───────────┴───────────────────┘""")
  }

  test("expr.rb rle_id: run ids over values and structs (u32 renders i64)") {
    val df = DataFrame(Seq[(Long, Option[String])](
      (1L, Some("x")), (2L, Some("x")), (1L, None), (1L, Some("y")), (1L, Some("y")))
      .toDF("a", "b"))
    check(df.withColumns(Seq(
      col("a").rleId.alias("a_r"),
      Polars.struct(col("a"), col("b")).rleId.alias("ab_r"))),
      """shape: (5, 4)
        |┌─────┬──────┬─────┬──────┐
        |│ a   ┆ b    ┆ a_r ┆ ab_r │
        |│ --- ┆ ---  ┆ --- ┆ ---  │
        |│ i64 ┆ str  ┆ i64 ┆ i64  │
        |╞═════╪══════╪═════╪══════╡
        |│ 1   ┆ x    ┆ 0   ┆ 0    │
        |│ 2   ┆ x    ┆ 1   ┆ 1    │
        |│ 1   ┆ null ┆ 2   ┆ 2    │
        |│ 1   ┆ y    ┆ 2   ┆ 3    │
        |│ 1   ┆ y    ┆ 2   ┆ 3    │
        |└─────┴──────┴─────┴──────┘""")
  }

  test("expr.rb to_physical: categorical codes in encounter order, nulls stay null") {
    val df = DataFrame(Seq(Some("a"), Some("x"), None, Some("a")).toDF("vals"))
    val got = df.withColumn("vals_physical", col("vals").cat.toPhysical)
      .toSpark.select("vals_physical").collect()
      .map(r => if (r.isNullAt(0)) null else r.get(0).toString.toLong)
    assert(got.toSeq == Seq(0L, 1L, null, 0L))
  }
}
