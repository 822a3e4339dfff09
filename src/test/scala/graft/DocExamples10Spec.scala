package graft

import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Round-12 tranche 9 of the reference `@example` golden corpus:
  * data_frame.rb map_rows naming defaults. Verbatim expected renders. */
class DocExamples10Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  private lazy val fooBar = DataFrame(Seq((1L, -1L), (2L, 5L), (3L, 8L)).toDF("foo", "bar"))

  test("expr.rb cut: default polars break labels (categorical is physically str, §1.2)") {
    val df = DataFrame(Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    check(df.withColumns(Seq(
      col("foo").cut(Seq(-1, 1), Some(Seq("a", "b", "c"))).alias("cut"))),
      """shape: (5, 2)
        |┌─────┬─────┐
        |│ foo ┆ cut │
        |│ --- ┆ --- │
        |│ i64 ┆ str │
        |╞═════╪═════╡
        |│ -2  ┆ a   │
        |│ -1  ┆ a   │
        |│ 0   ┆ b   │
        |│ 1   ┆ b   │
        |│ 2   ┆ c   │
        |└─────┴─────┘""")
  }

  test("expr.rb cut(include_breaks) unnests to breakpoint + category") {
    val df = DataFrame(Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    check(df.withColumns(Seq(
      col("foo").cut(Seq(-1, 1), includeBreaks = true).alias("cut"))).unnest("cut"),
      """shape: (5, 3)
        |┌─────┬────────────┬────────────┐
        |│ foo ┆ breakpoint ┆ category   │
        |│ --- ┆ ---        ┆ ---        │
        |│ i64 ┆ f64        ┆ str        │
        |╞═════╪════════════╪════════════╡
        |│ -2  ┆ -1.0       ┆ (-inf, -1] │
        |│ -1  ┆ -1.0       ┆ (-inf, -1] │
        |│ 0   ┆ 1.0        ┆ (-1, 1]    │
        |│ 1   ┆ 1.0        ┆ (-1, 1]    │
        |│ 2   ┆ inf        ┆ (1, inf]   │
        |└─────┴────────────┴────────────┘""")
  }

  test("expr.rb qcut by explicit quantile probabilities") {
    val df = DataFrame(Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    check(df.withColumns(Seq(
      col("foo").qcut(Seq(0.25, 0.75), Seq("a", "b", "c")).alias("qcut"))),
      """shape: (5, 2)
        |┌─────┬──────┐
        |│ foo ┆ qcut │
        |│ --- ┆ ---  │
        |│ i64 ┆ str  │
        |╞═════╪══════╡
        |│ -2  ┆ a    │
        |│ -1  ┆ a    │
        |│ 0   ┆ b    │
        |│ 1   ┆ b    │
        |│ 2   ┆ c    │
        |└─────┴──────┘""")
  }

  test("sql_context.rb execute: filtered/ordered projection over a registered frame") {
    val films = DataFrame(Seq(
      ("The Godfather", 1972L, 6000000L, 134821952L, 9.2),
      ("The Dark Knight", 2008L, 185000000L, 533316061L, 9.0),
      ("Schindler's List", 1993L, 22000000L, 96067179L, 8.9),
      ("Pulp Fiction", 1994L, 8000000L, 107930000L, 8.9),
      ("The Shawshank Redemption", 1994L, 25000000L, 28341469L, 9.3))
      .toDF("title", "release_year", "budget", "gross", "imdb_score"))
    val ctx = new graft.api.SQLContext(spark).register("films", films)
    check(ctx.executeEager(
      """SELECT title, release_year, imdb_score FROM films
        |WHERE release_year > 1990
        |ORDER BY imdb_score DESC, title""".stripMargin),
      """shape: (4, 3)
        |┌──────────────────────────┬──────────────┬────────────┐
        |│ title                    ┆ release_year ┆ imdb_score │
        |│ ---                      ┆ ---          ┆ ---        │
        |│ str                      ┆ i64          ┆ f64        │
        |╞══════════════════════════╪══════════════╪════════════╡
        |│ The Shawshank Redemption ┆ 1994         ┆ 9.3        │
        |│ The Dark Knight          ┆ 2008         ┆ 9.0        │
        |│ Pulp Fiction             ┆ 1994         ┆ 8.9        │
        |│ Schindler's List         ┆ 1993         ┆ 8.9        │
        |└──────────────────────────┴──────────────┴────────────┘""")
  }

  test("data_frame.rb map_rows: tuple rows materialize as column_0/column_1") {
    val out = fooBar.mapRows(StructType(Seq(
      StructField("column_0", LongType), StructField("column_1", LongType)))) { r =>
      Row(r.getLong(0) * 2, r.getLong(1) * 3)
    }
    check(out,
      """shape: (3, 2)
        |┌──────────┬──────────┐
        |│ column_0 ┆ column_1 │
        |│ ---      ┆ ---      │
        |│ i64      ┆ i64      │
        |╞══════════╪══════════╡
        |│ 2        ┆ -3       │
        |│ 4        ┆ 15       │
        |│ 6        ┆ 24       │
        |└──────────┴──────────┘""")
  }

  test("data_frame.rb map_rows: scalar rows materialize under 'apply'") {
    val out = fooBar.mapRows(StructType(Seq(StructField("apply", LongType)))) { r =>
      Row(r.getLong(0) * 2 + r.getLong(1))
    }
    check(out,
      """shape: (3, 1)
        |┌───────┐
        |│ apply │
        |│ ---   │
        |│ i64   │
        |╞═══════╡
        |│ 1     │
        |│ 9     │
        |│ 14    │
        |└───────┘""")
  }
}
