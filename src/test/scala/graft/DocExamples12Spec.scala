package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}

/** Round-13 tranche 11 of the reference `@example` golden corpus:
  * data_frame.rb blocks — group_by_dynamic hourly min/max, frame shift,
  * fill_null value + strategies (dtype-preserving), to_struct render,
  * unnest mixed-dtype struct, n_unique subsets, and row accessors. */
class DocExamples12Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("data_frame.rb group_by_dynamic 1h closed=right: time_min/time_max") {
    def at(m: Int) = java.sql.Timestamp.valueOf(f"2021-12-16 ${m / 60}%02d:${m % 60}%02d:00")
    val df = DataFrame((0 to 6).map(i => (at(i * 30), i.toLong)).toDF("time", "n"))
    check(df.groupByDynamic("time", every = "1h", closed = "right")
      .agg(col("time").min.alias("time_min"), col("time").max.alias("time_max"))
      .sortBy(Seq(col("time"))),
      """shape: (4, 3)
        |┌─────────────────────┬─────────────────────┬─────────────────────┐
        |│ time                ┆ time_min            ┆ time_max            │
        |│ ---                 ┆ ---                 ┆ ---                 │
        |│ datetime[μs]        ┆ datetime[μs]        ┆ datetime[μs]        │
        |╞═════════════════════╪═════════════════════╪═════════════════════╡
        |│ 2021-12-15 23:00:00 ┆ 2021-12-16 00:00:00 ┆ 2021-12-16 00:00:00 │
        |│ 2021-12-16 00:00:00 ┆ 2021-12-16 00:30:00 ┆ 2021-12-16 01:00:00 │
        |│ 2021-12-16 01:00:00 ┆ 2021-12-16 01:30:00 ┆ 2021-12-16 02:00:00 │
        |│ 2021-12-16 02:00:00 ┆ 2021-12-16 02:30:00 ┆ 2021-12-16 03:00:00 │
        |└─────────────────────┴─────────────────────┴─────────────────────┘""")
  }

  private def fooBarHam = DataFrame(Seq(
    (1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c")).toDF("foo", "bar", "ham"))

  test("data_frame.rb shift(1) and shift(-1) over all columns") {
    check(fooBarHam.shiftFrame(1),
      """shape: (3, 3)
        |┌──────┬──────┬──────┐
        |│ foo  ┆ bar  ┆ ham  │
        |│ ---  ┆ ---  ┆ ---  │
        |│ i64  ┆ i64  ┆ str  │
        |╞══════╪══════╪══════╡
        |│ null ┆ null ┆ null │
        |│ 1    ┆ 6    ┆ a    │
        |│ 2    ┆ 7    ┆ b    │
        |└──────┴──────┴──────┘""")
    check(fooBarHam.shiftFrame(-1),
      """shape: (3, 3)
        |┌──────┬──────┬──────┐
        |│ foo  ┆ bar  ┆ ham  │
        |│ ---  ┆ ---  ┆ ---  │
        |│ i64  ┆ i64  ┆ str  │
        |╞══════╪══════╪══════╡
        |│ 2    ┆ 7    ┆ b    │
        |│ 3    ┆ 8    ┆ c    │
        |│ null ┆ null ┆ null │
        |└──────┴──────┴──────┘""")
  }

  private def abNull = DataFrame(Seq(
    (Some(1L), Some(0.5)), (Some(2L), Some(4.0)), (None, None), (Some(4L), Some(13.0)))
    .map { case (a, b) => (a.map(Long.box).orNull, b.map(Double.box).orNull) }
    .toDF("a", "b"))

  test("data_frame.rb fill_null(99) keeps each column's dtype") {
    check(abNull.fillNull(99),
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

  test("data_frame.rb fill_null strategies: forward and max") {
    check(abNull.fillNullStrategy("forward"),
      """shape: (4, 2)
        |┌─────┬──────┐
        |│ a   ┆ b    │
        |│ --- ┆ ---  │
        |│ i64 ┆ f64  │
        |╞═════╪══════╡
        |│ 1   ┆ 0.5  │
        |│ 2   ┆ 4.0  │
        |│ 2   ┆ 4.0  │
        |│ 4   ┆ 13.0 │
        |└─────┴──────┘""")
    check(abNull.fillNullStrategy("max"),
      """shape: (4, 2)
        |┌─────┬──────┐
        |│ a   ┆ b    │
        |│ --- ┆ ---  │
        |│ i64 ┆ f64  │
        |╞═════╪══════╡
        |│ 1   ┆ 0.5  │
        |│ 2   ┆ 4.0  │
        |│ 4   ┆ 13.0 │
        |│ 4   ┆ 13.0 │
        |└─────┴──────┘""")
  }

  test("data_frame.rb to_struct('nums') renders the struct series") {
    val df = DataFrame(Seq(
      (1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"), (5L, "five"))
      .toDF("a", "b"))
    val s = Series("nums", df.toStruct("nums").toSpark)
    assert(Testing.renderSeries(s) ==
      """shape: (5,)
        |Series: 'nums' [struct[2]]
        |[
        |	{1,"one"}
        |	{2,"two"}
        |	{3,"three"}
        |	{4,"four"}
        |	{5,"five"}
        |]""".stripMargin)
  }

  test("data_frame.rb unnest: mixed-dtype struct decomposes in place") {
    val rows = Seq(
      ("foo", 1L, "a", Some(true), Seq(1L, 2L), "baz"),
      ("bar", 2L, "b", None, Seq(3L), "womp"))
      .map { case (bf, a, b, c, d, af) =>
        (bf, a, b, c.map(Boolean.box).orNull, d, af) }
    val df = DataFrame(rows.toDF("before", "t_a", "t_b", "t_c", "t_d", "after"))
      .select(col("before"),
        Polars.struct(col("t_a"), col("t_b"), col("t_c"), col("t_d")).alias("t_struct"),
        col("after"))
    check(df.unnest("t_struct"),
      """shape: (2, 6)
        |┌────────┬─────┬─────┬──────┬───────────┬───────┐
        |│ before ┆ t_a ┆ t_b ┆ t_c  ┆ t_d       ┆ after │
        |│ ---    ┆ --- ┆ --- ┆ ---  ┆ ---       ┆ ---   │
        |│ str    ┆ i64 ┆ str ┆ bool ┆ list[i64] ┆ str   │
        |╞════════╪═════╪═════╪══════╪═══════════╪═══════╡
        |│ foo    ┆ 1   ┆ a   ┆ true ┆ [1, 2]    ┆ baz   │
        |│ bar    ┆ 2   ┆ b   ┆ null ┆ [3]       ┆ womp  │
        |└────────┴─────┴─────┴──────┴───────────┴───────┘""")
  }

  test("data_frame.rb n_unique: plain, column subset, expression subset") {
    val df = DataFrame(Seq(
      (1L, 0.5, true), (1L, 0.5, true), (2L, 1.0, true),
      (3L, 2.0, false), (4L, 3.0, true), (5L, 3.0, true)).toDF("a", "b", "c"))
    assert(df.nUnique() == 5L)
    assert(df.nUnique(Seq(col("b"), col("c"))) == 4L)
    assert(df.nUnique(Seq(
      col("a").floorDiv(Polars.lit(2)), col("c") || (col("b") >= 2))) == 3L)
  }

  test("data_frame.rb row: by index and by predicate") {
    assert(fooBarHam.row(2) == Seq(3L, 8L, "c"))
    assert(fooBarHam.rowByPredicate(col("ham") === "b") == Seq(2L, 7L, "b"))
    val err = intercept[IllegalArgumentException](
      fooBarHam.rowByPredicate(col("foo") > 0))
    assert(err.getMessage.contains("2 or more rows"))
  }
}
