package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}

/** Round-13 tranche 10 of the reference `@example` golden corpus: the
  * remaining expr.rb aggregate examples (median, quantile interpolations,
  * skew, kurtosis, distinctness masks) plus the list_expr.rb eval-rank
  * golden. u32-typed examples (count, len, null_count, cum_count, rle,
  * rle_id, arg-ops, unique_counts headers) stay excluded from verbatim
  * rendering per the documented dtype divergence (Spark has no unsigned
  * ints) — those blocks are asserted at VALUE level instead. */
class DocExamples11Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("expr.rb median renders f64") {
    val df = DataFrame(Seq(-1L, 0L, 1L).toDF("a"))
    check(df.select(col("a").median),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 0.0 │
        |└─────┘""")
  }

  test("expr.rb quantile: all five interpolation modes") {
    val df = DataFrame((0L to 5L).toDF("a"))
    def q(interp: String, want: String): Unit =
      check(df.select(col("a").quantile(0.3, interp)),
        s"""shape: (1, 1)
           |┌─────┐
           |│ a   │
           |│ --- │
           |│ f64 │
           |╞═════╡
           |│ $want │
           |└─────┘""")
    q("nearest", "2.0")
    q("higher", "2.0")
    q("lower", "1.0")
    q("midpoint", "1.5")
    q("linear", "1.5")
  }

  test("expr.rb skew (biased default) renders 0.343622") {
    val df = DataFrame(Seq(1L, 2L, 3L, 2L, 1L).toDF("a"))
    check(df.select(col("a").skew()),
      """shape: (1, 1)
        |┌──────────┐
        |│ a        │
        |│ ---      │
        |│ f64      │
        |╞══════════╡
        |│ 0.343622 │
        |└──────────┘""")
  }

  test("expr.rb kurtosis (fisher, biased) renders -1.153061") {
    val df = DataFrame(Seq(1L, 2L, 3L, 2L, 1L).toDF("a"))
    check(df.select(col("a").kurtosis()),
      """shape: (1, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ f64       │
        |╞═══════════╡
        |│ -1.153061 │
        |└───────────┘""")
  }

  test("expr.rb is_unique / is_duplicated masks") {
    val df = DataFrame(Seq(1L, 1L, 2L).toDF("a"))
    check(df.select(col("a").isUnique),
      """shape: (3, 1)
        |┌───────┐
        |│ a     │
        |│ ---   │
        |│ bool  │
        |╞═══════╡
        |│ false │
        |│ false │
        |│ true  │
        |└───────┘""")
    check(df.select(col("a").isDuplicated),
      """shape: (3, 1)
        |┌───────┐
        |│ a     │
        |│ ---   │
        |│ bool  │
        |╞═══════╡
        |│ true  │
        |│ true  │
        |│ false │
        |└───────┘""")
  }

  test("expr.rb is_first (is_first_distinct) golden") {
    val df = DataFrame(Seq(1L, 2L, 3L, 1L, 5L).toDF("num"))
    check(df.withColumns(Seq(col("num").isFirstDistinct.alias("is_first"))),
      """shape: (5, 2)
        |┌─────┬──────────┐
        |│ num ┆ is_first │
        |│ --- ┆ ---      │
        |│ i64 ┆ bool     │
        |╞═════╪══════════╡
        |│ 1   ┆ true     │
        |│ 2   ┆ true     │
        |│ 3   ┆ true     │
        |│ 1   ┆ false    │
        |│ 5   ┆ true     │
        |└─────┴──────────┘""")
  }

  test("list_expr.rb eval(element.rank) golden via list.rank") {
    // the reference spells the within-list rank as
    // concat_list.list.eval(Polars.element.rank); graft's eval is
    // elementwise, so the order-dependent rank is list.rank (same result)
    val df = DataFrame(Seq((1L, 4L), (8L, 5L), (3L, 2L)).toDF("a", "b"))
    check(df.withColumns(Seq(
      concatList(col("a"), col("b")).list.rank().alias("rank"))),
      """shape: (3, 3)
        |┌─────┬─────┬────────────┐
        |│ a   ┆ b   ┆ rank       │
        |│ --- ┆ --- ┆ ---        │
        |│ i64 ┆ i64 ┆ list[f64]  │
        |╞═════╪═════╪════════════╡
        |│ 1   ┆ 4   ┆ [1.0, 2.0] │
        |│ 8   ┆ 5   ┆ [2.0, 1.0] │
        |│ 3   ┆ 2   ┆ [2.0, 1.0] │
        |└─────┴─────┴────────────┘""")
  }

  test("list.rank methods: ties, nulls, ordinal positions") {
    val df = DataFrame(Seq(Seq(3.0, 6.0, 1.0, 1.0, 6.0)).toDF("v"))
    def ranks(method: String): Seq[Any] =
      df.select(col("v").list.rank(method).alias("r"))
        .toSpark.collect()(0).getSeq[Any](0)
    assert(ranks("average") == Seq(3.0, 4.5, 1.5, 1.5, 4.5))
    assert(ranks("min") == Seq(3L, 4L, 1L, 1L, 4L))
    assert(ranks("max") == Seq(3L, 5L, 2L, 2L, 5L))
    assert(ranks("dense") == Seq(2L, 3L, 1L, 1L, 3L))
    assert(ranks("ordinal") == Seq(3L, 4L, 1L, 2L, 5L))
    // nulls rank null and do not count
    val withNull = DataFrame(Seq(Seq[Option[Double]](Some(2.0), None, Some(1.0))
      .map(_.map(Double.box).orNull)).toDF("v"))
      .select(col("v").list.rank().alias("r"))
      .toSpark.collect()(0).getSeq[Any](0)
    assert(withNull == Seq(2.0, null, 1.0))
  }

  // ---- u32-typed blocks, asserted at value level ----

  test("expr.rb agg_groups: per-group row indices (values; u32->i64)") {
    val df = DataFrame(Seq(
      ("one", 94L), ("one", 95L), ("one", 96L),
      ("two", 97L), ("two", 97L), ("two", 99L)).toDF("group", "value"))
    val got = df.groupBy(Seq("group"), maintainOrder = true)
      .agg(col("value").aggGroups)
      .toSpark.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("one") == Seq(0L, 1L, 2L))
    assert(got("two") == Seq(3L, 4L, 5L))
  }

  test("expr.rb count vs len over a null-bearing column (values)") {
    val df = DataFrame(Seq((Some(8L), None), (Some(9L), Some(4L)), (Some(10L), Some(4L)))
      .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b"))
    val counts = df.select(col("a").count.alias("a"), col("b").count.alias("b"))
      .toSpark.collect()(0)
    assert(counts.getLong(0) == 3L && counts.getLong(1) == 2L)
    val lens = df.select(col("a").len.alias("a"), col("b").len.alias("b"))
      .toSpark.collect()(0)
    assert(lens.getLong(0) == 3L && lens.getLong(1) == 3L)
  }

  test("expr.rb cum_count forward and reverse (values)") {
    val df = DataFrame(Seq(Option("x"), Option("k"), None, Option("d"))
      .map(_.orNull).toDF("a"))
    val got = df.withColumns(Seq(
      col("a").cumCount().alias("cc"),
      col("a").cumCount(reverse = true).alias("ccr"))).toSpark.collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 2L, 2L, 3L))
    assert(got.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L, 1L))
  }

  test("series.rb arg_min / arg_max on [3, 2, 1]") {
    val s = Series("a", Seq(3L, 2L, 1L).toDF("a"))
    assert(s.argMin == 2L && s.argMax == 0L)
  }

  test("expr.rb arg_unique: first-occurrence indices (values)") {
    val a = Series("a", Seq(8L, 9L, 10L).toDF("a"))
    assert(a.argUnique.toList == List(0L, 1L, 2L))
    val b = Series("b", Seq[Option[Long]](None, Some(4L), Some(4L))
      .map(_.map(Long.box).orNull).toDF("b"))
    assert(b.argUnique.toList == List(0L, 1L))
  }

  test("series.rb rle on [1,1,2,1,null,1,3,3] (values)") {
    val s = Series("s", Seq[Option[Long]](
      Some(1L), Some(1L), Some(2L), Some(1L), None, Some(1L), Some(3L), Some(3L))
      .map(_.map(Long.box).orNull).toDF("s"))
    val rows = s.rle.df.select(F.col("rle").getField("len"), F.col("rle").getField("value")).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 1L, 1L, 1L, 1L, 2L))
    assert(rows.map(r => Option(r.get(1))).toSeq ==
      Seq(Some(1L), Some(2L), Some(1L), None, Some(1L), Some(3L)))
  }

  test("series.rb rle_id on [1,1,2,1,null,1,3,3] (values)") {
    val s = Series("s", Seq[Option[Long]](
      Some(1L), Some(1L), Some(2L), Some(1L), None, Some(1L), Some(3L), Some(3L))
      .map(_.map(Long.box).orNull).toDF("s"))
    assert(s.rleId.toList == List(0L, 0L, 1L, 2L, 3L, 4L, 5L, 5L))
  }

  test("expr.rb rle_id: plain column and struct key (values)") {
    val df = DataFrame(Seq(
      (1L, Option("x")), (2L, Option("x")), (1L, None), (1L, Option("y")), (1L, Option("y")))
      .map { case (a, b) => (a, b.orNull) }.toDF("a", "b"))
    val got = df.withColumns(Seq(
      col("a").rleId.alias("a_r"),
      Polars.struct(col("a"), col("b")).rleId.alias("ab_r"))).toSpark.collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 2L, 2L))
    assert(got.map(_.getLong(3)).toSeq == Seq(0L, 1L, 2L, 3L, 3L))
  }

  test("series.rb unique_counts in appearance order (values)") {
    val s = Series("id", Seq("a", "b", "b", "c", "c", "c").toDF("id"))
    assert(s.uniqueCounts.toList == List(1L, 2L, 3L))
  }

  test("series.rb value_counts: count column naming follows the implementation") {
    // the reference's series.rb docstring still renders the pre-rename
    // 'counts' header, but its IMPLEMENTATION (series.rb:1092) names the
    // column 'count' ('proportion' under normalize) — graft follows the code
    val s = Series("a", Seq(1L, 2L, 2L, 3L).toDF("a"))
    val vc = s.valueCounts().sortBy(Seq(col("a"))).toSpark
    assert(vc.columns.toSeq == Seq("a", "count"))
    assert(vc.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 2L), (3L, 1L)))
  }

  test("expr.rb null_count (values)") {
    val df = DataFrame(Seq((None, Some(1L)), (Some(1L), Some(2L)), (None, Some(3L)))
      .map { case (a, b) => (a.map(Long.box).orNull, b.map(Long.box).orNull) }
      .toDF("a", "b"))
    val got = df.select(col("a").nullCount.alias("a"), col("b").nullCount.alias("b"))
      .toSpark.collect()(0)
    assert(got.getLong(0) == 2L && got.getLong(1) == 0L)
  }

  test("series.rb n_unique") {
    assert(Series("a", Seq(1L, 2L, 2L, 3L).toDF("a")).nUnique == 3L)
  }
}
