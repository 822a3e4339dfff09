package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.testing.Testing

/** Round-14 tranche 15 — data_frame.rb surface blocks with no prior port:
  * column surgery (insert_column, replace_column-by-index), with_row_index,
  * hstack(Series), extend, drop forms, clear/clear(n), frame-level
  * shift_and_fill/sum/std/null_count. u32 headers render i64 (§1.2). */
class DocExamples16Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("data_frame.rb insert_column at an index (both goldens)") {
    val df = DataFrame(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("foo", "bar"))
    check(df.insertColumn(1, Series("baz", Seq(97L, 98L, 99L))),
      """shape: (3, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ baz ┆ bar │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ i64 │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 97  ┆ 4   │
        |│ 2   ┆ 98  ┆ 5   │
        |│ 3   ┆ 99  ┆ 6   │
        |└─────┴─────┴─────┘""")
    val df2 = DataFrame(Seq((1L, 0.5, true), (2L, 4.0, true), (3L, 10.0, false), (4L, 13.0, true))
      .toDF("a", "b", "c"))
    check(df2.insertColumn(3, Series("d", Seq(-2.5, 15.0, 20.5, 0.0))),
      """shape: (4, 4)
        |┌─────┬──────┬───────┬──────┐
        |│ a   ┆ b    ┆ c     ┆ d    │
        |│ --- ┆ ---  ┆ ---   ┆ ---  │
        |│ i64 ┆ f64  ┆ bool  ┆ f64  │
        |╞═════╪══════╪═══════╪══════╡
        |│ 1   ┆ 0.5  ┆ true  ┆ -2.5 │
        |│ 2   ┆ 4.0  ┆ true  ┆ 15.0 │
        |│ 3   ┆ 10.0 ┆ false ┆ 20.5 │
        |│ 4   ┆ 13.0 ┆ true  ┆ 0.0  │
        |└─────┴──────┴───────┴──────┘""")
  }

  test("data_frame.rb replace_column by index renames too (data_frame.rb:1480)") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.replaceColumn(0, Series("apple", Seq(10L, 20L, 30L))),
      """shape: (3, 3)
        |┌───────┬─────┬─────┐
        |│ apple ┆ bar ┆ ham │
        |│ ---   ┆ --- ┆ --- │
        |│ i64   ┆ i64 ┆ str │
        |╞═══════╪═════╪═════╡
        |│ 10    ┆ 6   ┆ a   │
        |│ 20    ┆ 7   ┆ b   │
        |│ 30    ┆ 8   ┆ c   │
        |└───────┴─────┴─────┘""")
  }

  test("data_frame.rb with_row_index leads at column 0 (u32 renders i64)") {
    val df = DataFrame(Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b"))
    check(df.withRowIndex(),
      """shape: (3, 3)
        |┌───────┬─────┬─────┐
        |│ index ┆ a   ┆ b   │
        |│ ---   ┆ --- ┆ --- │
        |│ i64   ┆ i64 ┆ i64 │
        |╞═══════╪═════╪═════╡
        |│ 0     ┆ 1   ┆ 2   │
        |│ 1     ┆ 3   ┆ 4   │
        |│ 2     ┆ 5   ┆ 6   │
        |└───────┴─────┴─────┘""")
  }

  test("data_frame.rb hstack a series (data_frame.rb golden)") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.hstack(Series("apple", Seq(10L, 20L, 30L)).toFrame),
      """shape: (3, 4)
        |┌─────┬─────┬─────┬───────┐
        |│ foo ┆ bar ┆ ham ┆ apple │
        |│ --- ┆ --- ┆ --- ┆ ---   │
        |│ i64 ┆ i64 ┆ str ┆ i64   │
        |╞═════╪═════╪═════╪═══════╡
        |│ 1   ┆ 6   ┆ a   ┆ 10    │
        |│ 2   ┆ 7   ┆ b   ┆ 20    │
        |│ 3   ┆ 8   ┆ c   ┆ 30    │
        |└─────┴─────┴─────┴───────┘""")
  }

  test("data_frame.rb extend appends rows (data_frame.rb golden)") {
    val df1 = DataFrame(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("foo", "bar"))
    val df2 = DataFrame(Seq((10L, 40L), (20L, 50L), (30L, 60L)).toDF("foo", "bar"))
    check(df1.extend(df2),
      """shape: (6, 2)
        |┌─────┬─────┐
        |│ foo ┆ bar │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 1   ┆ 4   │
        |│ 2   ┆ 5   │
        |│ 3   ┆ 6   │
        |│ 10  ┆ 40  │
        |│ 20  ┆ 50  │
        |│ 30  ┆ 60  │
        |└─────┴─────┘""")
  }

  test("data_frame.rb drop: single, list, varargs (data_frame.rb golden)") {
    val df = DataFrame(Seq((1L, 6.0, "a"), (2L, 7.0, "b"), (3L, 8.0, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.drop("ham"),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ foo ┆ bar │
        |│ --- ┆ --- │
        |│ i64 ┆ f64 │
        |╞═════╪═════╡
        |│ 1   ┆ 6.0 │
        |│ 2   ┆ 7.0 │
        |│ 3   ┆ 8.0 │
        |└─────┴─────┘""")
    check(df.drop("bar", "ham"),
      """shape: (3, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |│ 2   │
        |│ 3   │
        |└─────┘""")
    check(df.drop("foo", "ham"),
      """shape: (3, 1)
        |┌─────┐
        |│ bar │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ 6.0 │
        |│ 7.0 │
        |│ 8.0 │
        |└─────┘""")
  }

  test("data_frame.rb clear and clear(n) (data_frame.rb golden)") {
    val df = DataFrame(Seq[(Option[Long], Option[Double], Option[Boolean])](
      (None, Some(0.5), Some(true)), (Some(2L), None, Some(true)),
      (Some(3L), Some(2.5), Some(false)), (Some(4L), Some(13.0), None))
      .toDF("a", "b", "c"))
    check(df.clear(),
      """shape: (0, 3)
        |┌─────┬─────┬──────┐
        |│ a   ┆ b   ┆ c    │
        |│ --- ┆ --- ┆ ---  │
        |│ i64 ┆ f64 ┆ bool │
        |╞═════╪═════╪══════╡
        |└─────┴─────┴──────┘""")
    check(df.clear(2),
      """shape: (2, 3)
        |┌──────┬──────┬──────┐
        |│ a    ┆ b    ┆ c    │
        |│ ---  ┆ ---  ┆ ---  │
        |│ i64  ┆ f64  ┆ bool │
        |╞══════╪══════╪══════╡
        |│ null ┆ null ┆ null │
        |│ null ┆ null ┆ null │
        |└──────┴──────┴──────┘""")
  }

  test("data_frame.rb shift_and_fill casts the fill per column dtype (data_frame.rb golden)") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.shiftAndFillFrame(1, 0),
      """shape: (3, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ str │
        |╞═════╪═════╪═════╡
        |│ 0   ┆ 0   ┆ 0   │
        |│ 1   ┆ 6   ┆ a   │
        |│ 2   ┆ 7   ┆ b   │
        |└─────┴─────┴─────┘""")
  }

  test("data_frame.rb sum/std/null_count frame-level keep non-numeric columns as typed nulls") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.sumFrame,
      """shape: (1, 3)
        |┌─────┬─────┬──────┐
        |│ foo ┆ bar ┆ ham  │
        |│ --- ┆ --- ┆ ---  │
        |│ i64 ┆ i64 ┆ str  │
        |╞═════╪═════╪══════╡
        |│ 6   ┆ 21  ┆ null │
        |└─────┴─────┴──────┘""")
    check(df.stdFrame(),
      """shape: (1, 3)
        |┌─────┬─────┬──────┐
        |│ foo ┆ bar ┆ ham  │
        |│ --- ┆ --- ┆ ---  │
        |│ f64 ┆ f64 ┆ str  │
        |╞═════╪═════╪══════╡
        |│ 1.0 ┆ 1.0 ┆ null │
        |└─────┴─────┴──────┘""")
    check(df.stdFrame(0),
      """shape: (1, 3)
        |┌──────────┬──────────┬──────┐
        |│ foo      ┆ bar      ┆ ham  │
        |│ ---      ┆ ---      ┆ ---  │
        |│ f64      ┆ f64      ┆ str  │
        |╞══════════╪══════════╪══════╡
        |│ 0.816497 ┆ 0.816497 ┆ null │
        |└──────────┴──────────┴──────┘""")
    val dn = DataFrame(Seq[(Option[Long], Option[Long], String)](
      (Some(1L), Some(6L), "a"), (None, Some(7L), "b"), (Some(3L), None, "c"))
      .toDF("foo", "bar", "ham"))
    check(dn.nullCount,
      """shape: (1, 3)
        |┌─────┬─────┬─────┐
        |│ foo ┆ bar ┆ ham │
        |│ --- ┆ --- ┆ --- │
        |│ i64 ┆ i64 ┆ i64 │
        |╞═════╪═════╪═════╡
        |│ 1   ┆ 1   ┆ 0   │
        |└─────┴─────┴─────┘""")
  }
}
