package graft

import graft.Polars.col
import graft.api.DataFrame
import graft.testing.Testing

/** Round-12 tranche 4 of the reference `@example` golden corpus: string_expr
  * namespace depth (split family, grapheme reverse, typed integer/decimal
  * parses, capture groups). Verbatim expected renders, same rules as
  * DocExamplesSpec. Porting notes: extract_groups takes explicit group
  * names (the reference derives them from the pattern — Spark's
  * regexp_extract has no group-name introspection pre-analysis);
  * to_decimal takes an explicit scale (the reference infers scale from the
  * first 100 values — an eager data scan the lazy Expr layer doesn't do). */
class DocExamples5Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  test("string_expr.rb to_lowercase") {
    val df = DataFrame(Seq("CAT", "DOG").toDF("foo"))
    check(df.select(col("foo").str.toLowercase),
      """shape: (2, 1)
        |┌─────┐
        |│ foo │
        |│ --- │
        |│ str │
        |╞═════╡
        |│ cat │
        |│ dog │
        |└─────┘""")
  }

  test("string_expr.rb split by substring") {
    val df = DataFrame(Seq("foo bar", "foo-bar", "foo bar baz").toDF("s"))
    check(df.select(col("s").str.split(" ")),
      """shape: (3, 1)
        |┌───────────────────────┐
        |│ s                     │
        |│ ---                   │
        |│ list[str]             │
        |╞═══════════════════════╡
        |│ ["foo", "bar"]        │
        |│ ["foo-bar"]           │
        |│ ["foo", "bar", "baz"] │
        |└───────────────────────┘""")
  }

  test("string_expr.rb split_exact: struct fields, null row stays {null,null}") {
    val df = DataFrame(Seq[Option[String]](Some("a_1"), None, Some("c"), Some("d_4"))
      .toDF("x"))
    check(df.select(col("x").str.splitExact("_", 1).alias("fields")),
      """shape: (4, 1)
        |┌─────────────┐
        |│ fields      │
        |│ ---         │
        |│ struct[2]   │
        |╞═════════════╡
        |│ {"a","1"}   │
        |│ {null,null} │
        |│ {"c",null}  │
        |│ {"d","4"}   │
        |└─────────────┘""")
  }

  test("string_expr.rb splitn: remainder rides in the last field") {
    val df = DataFrame(Seq[Option[String]](Some("foo bar"), None, Some("foo-bar"),
      Some("foo bar baz")).toDF("s"))
    check(df.select(col("s").str.splitn(" ", 2).alias("fields")),
      """shape: (4, 1)
        |┌───────────────────┐
        |│ fields            │
        |│ ---               │
        |│ struct[2]         │
        |╞═══════════════════╡
        |│ {"foo","bar"}     │
        |│ {null,null}       │
        |│ {"foo-bar",null}  │
        |│ {"foo","bar baz"} │
        |└───────────────────┘""")
  }

  test("string_expr.rb extract_groups then unnest") {
    val df = DataFrame(Seq(
      "http://vote.com/ballon_dor?candidate=messi&ref=python",
      "http://vote.com/ballon_dor?candidate=weghorst&ref=polars",
      "http://vote.com/ballon_dor?error=404&ref=rust").toDF("url"))
    val pattern = """candidate=(\w+)&ref=(\w+)"""
    check(df.select(col("url").str.extractGroups(pattern, Seq("candidate", "ref"))
      .alias("captures")).unnest("captures"),
      """shape: (3, 2)
        |┌───────────┬────────┐
        |│ candidate ┆ ref    │
        |│ ---       ┆ ---    │
        |│ str       ┆ str    │
        |╞═══════════╪════════╡
        |│ messi     ┆ python │
        |│ weghorst  ┆ polars │
        |│ null      ┆ null   │
        |└───────────┴────────┘""")
  }

  test("string_expr.rb reverse keeps combining marks on their base") {
    // docstring input is DECOMPOSED (n + combining tilde); the reversed
    // output keeps the 2-codepoint grapheme intact and the renderer pads it
    // as ONE display column
    val manana = "man\u0303ana"
    val df = DataFrame(Seq("foo", "bar", manana).toDF("text"))
    check(df.withColumns(Seq(col("text").str.reverse.alias("reversed"))),
      s"""shape: (3, 2)
        |\u250c\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u252c\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2510
        |\u2502 text   \u2506 reversed \u2502
        |\u2502 ---    \u2506 ---      \u2502
        |\u2502 str    \u2506 str      \u2502
        |\u255e\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u256a\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u2550\u2561
        |\u2502 foo    \u2506 oof      \u2502
        |\u2502 bar    \u2506 rab      \u2502
        |\u2502 $manana \u2506 anan\u0303am   \u2502
        |\u2514\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2534\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2500\u2518""")
  }

  test("string_expr.rb to_integer(base: 2, strict: false) nulls invalid values") {
    val df = DataFrame(Seq("110", "101", "010", "invalid").toDF("bin"))
    check(df.withColumns(Seq(
      col("bin").str.toInteger(2, strict = false).alias("parsed"))),
      """shape: (4, 2)
        |┌─────────┬────────┐
        |│ bin     ┆ parsed │
        |│ ---     ┆ ---    │
        |│ str     ┆ i64    │
        |╞═════════╪════════╡
        |│ 110     ┆ 6      │
        |│ 101     ┆ 5      │
        |│ 010     ┆ 2      │
        |│ invalid ┆ null   │
        |└─────────┴────────┘""")
  }

  test("string_expr.rb to_decimal renders decimal[*,2] with scale kept") {
    val df = DataFrame(Seq("40.12", "3420.13", "120134.19", "3212.98",
      "12.90", "143.09", "143.9").toDF("numbers"))
    check(df.withColumns(Seq(
      col("numbers").str.toDecimal(38, 2).alias("numbers_decimal"))),
      """shape: (7, 2)
        |┌───────────┬─────────────────┐
        |│ numbers   ┆ numbers_decimal │
        |│ ---       ┆ ---             │
        |│ str       ┆ decimal[*,2]    │
        |╞═══════════╪═════════════════╡
        |│ 40.12     ┆ 40.12           │
        |│ 3420.13   ┆ 3420.13         │
        |│ 120134.19 ┆ 120134.19       │
        |│ 3212.98   ┆ 3212.98         │
        |│ 12.90     ┆ 12.90           │
        |│ 143.09    ┆ 143.09          │
        |│ 143.9     ┆ 143.90          │
        |└───────────┴─────────────────┘""")
  }
}
