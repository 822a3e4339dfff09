package graft

import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing

/** Round-12 tranche 8 of the reference `@example` golden corpus:
  * functions/as_datatype.rb struct constructor forms. */
class DocExamples9Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("as_datatype.rb struct over all columns renders nested cells") {
    val df = DataFrame(Seq[(Long, String, Option[Boolean], Seq[Long])](
      (1L, "a", Some(true), Seq(1L, 2L)), (2L, "b", None, Seq(3L)))
      .toDF("int", "str", "bool", "list"))
    check(df.select(Polars.struct(col("int"), col("str"), col("bool"), col("list"))
      .alias("my_struct")),
      """shape: (2, 1)
        |┌─────────────────────┐
        |│ my_struct           │
        |│ ---                 │
        |│ struct[4]           │
        |╞═════════════════════╡
        |│ {1,"a",true,[1, 2]} │
        |│ {2,"b",null,[3]}    │
        |└─────────────────────┘""")
  }

  test("as_datatype.rb duration: column-valued parts added to a datetime") {
    val df = DataFrame(Seq(
      (java.sql.Timestamp.valueOf("2022-01-01 00:00:00"), 1L),
      (java.sql.Timestamp.valueOf("2022-01-02 00:00:00"), 2L)).toDF("datetime", "add"))
    check(df.select(
      col("datetime").dt.addDuration(Polars.durationExpr(weeks = col("add"))).alias("add_weeks"),
      col("datetime").dt.addDuration(Polars.durationExpr(days = col("add"))).alias("add_days"),
      col("datetime").dt.addDuration(Polars.durationExpr(seconds = col("add"))).alias("add_seconds"),
      col("datetime").dt.addDuration(Polars.durationExpr(milliseconds = col("add"))).alias("add_milliseconds"),
      col("datetime").dt.addDuration(Polars.durationExpr(hours = col("add"))).alias("add_hours")),
      """shape: (2, 5)
        |┌─────────────────────┬─────────────────────┬─────────────────────┬─────────────────────────┬─────────────────────┐
        |│ add_weeks           ┆ add_days            ┆ add_seconds         ┆ add_milliseconds        ┆ add_hours           │
        |│ ---                 ┆ ---                 ┆ ---                 ┆ ---                     ┆ ---                 │
        |│ datetime[μs]        ┆ datetime[μs]        ┆ datetime[μs]        ┆ datetime[μs]            ┆ datetime[μs]        │
        |╞═════════════════════╪═════════════════════╪═════════════════════╪═════════════════════════╪═════════════════════╡
        |│ 2022-01-08 00:00:00 ┆ 2022-01-02 00:00:00 ┆ 2022-01-01 00:00:01 ┆ 2022-01-01 00:00:00.001 ┆ 2022-01-01 01:00:00 │
        |│ 2022-01-16 00:00:00 ┆ 2022-01-04 00:00:00 ┆ 2022-01-02 00:00:02 ┆ 2022-01-02 00:00:00.002 ┆ 2022-01-02 02:00:00 │
        |└─────────────────────┴─────────────────────┴─────────────────────┴─────────────────────────┴─────────────────────┘""")
  }

  test("as_datatype.rb struct with a literal member") {
    val df = DataFrame(Seq[(Long, String)]((1L, "a"), (2L, "b")).toDF("int", "str"))
    check(df.select(Polars.struct(col("int"), Polars.lit(false)).alias("my_struct")),
      """shape: (2, 1)
        |┌───────────┐
        |│ my_struct │
        |│ ---       │
        |│ struct[2] │
        |╞═══════════╡
        |│ {1,false} │
        |│ {2,false} │
        |└───────────┘""")
  }
}
