package graft

import graft.Polars
import graft.Polars.{col, lit}
import graft.api.DataFrame
import graft.testing.Testing
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.LongType

/** Round-12 tranche 2 of the reference `@example` golden corpus: string_expr
  * namespace depth, date_time_expr parts, and expr.rb arithmetic/bounds.
  * Verbatim expected renders, same rules as DocExamplesSpec. */
class DocExamples3Spec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  // ---- string_expr.rb ----
  test("string_expr.rb strip / lstrip / rstrip") {
    val df = DataFrame(Seq(" lead", "trail ", " both ").toDF("foo"))
    check(df.select(col("foo").str.stripChars),
      """shape: (3, 1)
        |┌───────┐
        |│ foo   │
        |│ ---   │
        |│ str   │
        |╞═══════╡
        |│ lead  │
        |│ trail │
        |│ both  │
        |└───────┘""")
    check(df.select(col("foo").str.stripCharsStart),
      """shape: (3, 1)
        |┌────────┐
        |│ foo    │
        |│ ---    │
        |│ str    │
        |╞════════╡
        |│ lead   │
        |│ trail  │
        |│ both   │
        |└────────┘""")
    check(df.select(col("foo").str.stripCharsEnd),
      """shape: (3, 1)
        |┌───────┐
        |│ foo   │
        |│ ---   │
        |│ str   │
        |╞═══════╡
        |│  lead │
        |│ trail │
        |│  both │
        |└───────┘""")
  }

  test("string_expr.rb strip_prefix / strip_suffix") {
    val dfp = DataFrame(Seq("foobar", "foofoobar", "foo", "bar").toDF("a"))
    check(dfp.withColumns(Seq(col("a").str.stripPrefix("foo").alias("stripped"))),
      """shape: (4, 2)
        |┌───────────┬──────────┐
        |│ a         ┆ stripped │
        |│ ---       ┆ ---      │
        |│ str       ┆ str      │
        |╞═══════════╪══════════╡
        |│ foobar    ┆ bar      │
        |│ foofoobar ┆ foobar   │
        |│ foo       ┆          │
        |│ bar       ┆ bar      │
        |└───────────┴──────────┘""")
    val dfs = DataFrame(Seq("foobar", "foobarbar", "foo", "bar").toDF("a"))
    check(dfs.withColumns(Seq(col("a").str.stripSuffix("bar").alias("stripped"))),
      """shape: (4, 2)
        |┌───────────┬──────────┐
        |│ a         ┆ stripped │
        |│ ---       ┆ ---      │
        |│ str       ┆ str      │
        |╞═══════════╪══════════╡
        |│ foobar    ┆ foo      │
        |│ foobarbar ┆ foobar   │
        |│ foo       ┆ foo      │
        |│ bar       ┆          │
        |└───────────┴──────────┘""")
  }

  test("string_expr.rb pad_start / pad_end never truncate") {
    val df = DataFrame(Seq(Option("cow"), Option("monkey"), Option("hippopotamus"),
      Option.empty[String]).toDF("a"))
    check(df.withColumns(Seq(col("a").str.padStart(8, "*").alias("padded"))),
      """shape: (4, 2)
        |┌──────────────┬──────────────┐
        |│ a            ┆ padded       │
        |│ ---          ┆ ---          │
        |│ str          ┆ str          │
        |╞══════════════╪══════════════╡
        |│ cow          ┆ *****cow     │
        |│ monkey       ┆ **monkey     │
        |│ hippopotamus ┆ hippopotamus │
        |│ null         ┆ null         │
        |└──────────────┴──────────────┘""")
    check(df.withColumns(Seq(col("a").str.padEnd(8, "*").alias("padded"))),
      """shape: (4, 2)
        |┌──────────────┬──────────────┐
        |│ a            ┆ padded       │
        |│ ---          ┆ ---          │
        |│ str          ┆ str          │
        |╞══════════════╪══════════════╡
        |│ cow          ┆ cow*****     │
        |│ monkey       ┆ monkey**     │
        |│ hippopotamus ┆ hippopotamus │
        |│ null         ┆ null         │
        |└──────────────┴──────────────┘""")
  }

  test("string_expr.rb zfill is sign-aware") {
    val df = DataFrame(Seq(Option(-1L), Option(123L), Option(999999L), Option.empty[Long])
      .toDF("a"))
    check(df.withColumns(Seq(
      col("a").cast(org.apache.spark.sql.types.StringType).str.zfill(4).alias("zfill"))),
      """shape: (4, 2)
        |┌────────┬────────┐
        |│ a      ┆ zfill  │
        |│ ---    ┆ ---    │
        |│ i64    ┆ str    │
        |╞════════╪════════╡
        |│ -1     ┆ -001   │
        |│ 123    ┆ 0123   │
        |│ 999999 ┆ 999999 │
        |│ null   ┆ null   │
        |└────────┴────────┘""")
  }

  test("string_expr.rb json_path_match") {
    val df = DataFrame(Seq(Option("""{"a":"1"}"""), Option.empty[String],
      Option("""{"a":2}"""), Option("""{"a":2.1}"""), Option("""{"a":true}"""))
      .toDF("json_val"))
    check(df.select(col("json_val").str.jsonPathMatch("$.a")),
      """shape: (5, 1)
        |┌──────────┐
        |│ json_val │
        |│ ---      │
        |│ str      │
        |╞══════════╡
        |│ 1        │
        |│ null     │
        |│ 2        │
        |│ 2.1      │
        |│ true     │
        |└──────────┘""")
  }

  test("string_expr.rb replace (first match) and replace_all") {
    val df = DataFrame(Seq((1L, "123abc"), (2L, "abc456")).toDF("id", "text"))
    check(df.withColumns(Seq(col("text").str.replace("abc\\b", "ABC"))),
      """shape: (2, 2)
        |┌─────┬────────┐
        |│ id  ┆ text   │
        |│ --- ┆ ---    │
        |│ i64 ┆ str    │
        |╞═════╪════════╡
        |│ 1   ┆ 123ABC │
        |│ 2   ┆ abc456 │
        |└─────┴────────┘""")
    val df2 = DataFrame(Seq((1L, "abcabc"), (2L, "123a123")).toDF("id", "text"))
    check(df2.withColumns(Seq(col("text").str.replaceAll("a", "-"))),
      """shape: (2, 2)
        |┌─────┬─────────┐
        |│ id  ┆ text    │
        |│ --- ┆ ---     │
        |│ i64 ┆ str     │
        |╞═════╪═════════╡
        |│ 1   ┆ -bc-bc  │
        |│ 2   ┆ 123-123 │
        |└─────┴─────────┘""")
  }

  test("string_expr.rb to_integer(base: 16)") {
    val df = DataFrame(Seq(Option("fa1e"), Option("ff00"), Option("cafe"),
      Option.empty[String]).toDF("hex"))
    check(df.withColumns(Seq(col("hex").str.toInteger(16).alias("parsed"))),
      """shape: (4, 2)
        |┌──────┬────────┐
        |│ hex  ┆ parsed │
        |│ ---  ┆ ---    │
        |│ str  ┆ i64    │
        |╞══════╪════════╡
        |│ fa1e ┆ 64030  │
        |│ ff00 ┆ 65280  │
        |│ cafe ┆ 51966  │
        |│ null ┆ null   │
        |└──────┴────────┘""")
  }

  test("string_expr.rb replace_many is simultaneous; long cells truncate at 30") {
    val df = DataFrame(Seq(
      "Everybody wants to rule the world",
      "Tell me what you want, what you really really want",
      "Can you feel the love tonight").toDF("lyrics"))
    check(df.withColumns(Seq(
      col("lyrics").str.replaceMany(Seq("me", "you"), Seq("you", "me")).alias("confusing"))),
      """shape: (3, 2)
        |┌─────────────────────────────────┬─────────────────────────────────┐
        |│ lyrics                          ┆ confusing                       │
        |│ ---                             ┆ ---                             │
        |│ str                             ┆ str                             │
        |╞═════════════════════════════════╪═════════════════════════════════╡
        |│ Everybody wants to rule the wo… ┆ Everybody wants to rule the wo… │
        |│ Tell me what you want, what yo… ┆ Tell you what me want, what me… │
        |│ Can you feel the love tonight   ┆ Can me feel the love tonight    │
        |└─────────────────────────────────┴─────────────────────────────────┘""")
  }

  // ---- date_time_expr.rb ----
  test("date_time_expr.rb is_leap_year") {
    val df = DataFrame(Seq(
      java.sql.Date.valueOf("2000-01-01"), java.sql.Date.valueOf("2001-01-01"),
      java.sql.Date.valueOf("2002-01-01")).toDF("date"))
    check(df.withColumns(Seq(col("date").dt.isLeapYear.alias("leap_year"))),
      """shape: (3, 2)
        |┌────────────┬───────────┐
        |│ date       ┆ leap_year │
        |│ ---        ┆ ---       │
        |│ date       ┆ bool      │
        |╞════════════╪═══════════╡
        |│ 2000-01-01 ┆ true      │
        |│ 2001-01-01 ┆ false     │
        |│ 2002-01-01 ┆ false     │
        |└────────────┴───────────┘""")
  }

  test("date_time_expr.rb quarter is i8") {
    val df = DataFrame(Seq(
      java.sql.Date.valueOf("2001-01-01"), java.sql.Date.valueOf("2001-06-30"),
      java.sql.Date.valueOf("2001-12-27")).toDF("date"))
    check(df.withColumns(Seq(col("date").dt.quarter.alias("quarter"))),
      """shape: (3, 2)
        |┌────────────┬─────────┐
        |│ date       ┆ quarter │
        |│ ---        ┆ ---     │
        |│ date       ┆ i8      │
        |╞════════════╪═════════╡
        |│ 2001-01-01 ┆ 1       │
        |│ 2001-06-30 ┆ 2       │
        |│ 2001-12-27 ┆ 4       │
        |└────────────┴─────────┘""")
  }

  test("date_time_expr.rb epoch: default µs and seconds") {
    val df = DataFrame(Seq(
      java.sql.Date.valueOf("2001-01-01"), java.sql.Date.valueOf("2001-01-02"),
      java.sql.Date.valueOf("2001-01-03")).toDF("date"))
    check(df.withColumns(Seq(
      col("date").dt.epoch().alias("epoch_ns"),
      col("date").dt.epoch("s").alias("epoch_s"))),
      """shape: (3, 3)
        |┌────────────┬─────────────────┬───────────┐
        |│ date       ┆ epoch_ns        ┆ epoch_s   │
        |│ ---        ┆ ---             ┆ ---       │
        |│ date       ┆ i64             ┆ i64       │
        |╞════════════╪═════════════════╪═══════════╡
        |│ 2001-01-01 ┆ 978307200000000 ┆ 978307200 │
        |│ 2001-01-02 ┆ 978393600000000 ┆ 978393600 │
        |│ 2001-01-03 ┆ 978480000000000 ┆ 978480000 │
        |└────────────┴─────────────────┴───────────┘""")
  }

  // ---- expr.rb arithmetic / bounds ----
  test("expr.rb truediv and floordiv") {
    val df = DataFrame(Seq(1L, 2L, 3L, 4L, 5L).toDF("x"))
    check(df.withColumns(Seq(
      (col("x") / 2).alias("x/2"),
      col("x").floorDiv(lit(2)).alias("x//2"))),
      """shape: (5, 3)
        |┌─────┬─────┬──────┐
        |│ x   ┆ x/2 ┆ x//2 │
        |│ --- ┆ --- ┆ ---  │
        |│ i64 ┆ f64 ┆ i64  │
        |╞═════╪═════╪══════╡
        |│ 1   ┆ 0.5 ┆ 0    │
        |│ 2   ┆ 1.0 ┆ 1    │
        |│ 3   ┆ 1.5 ┆ 1    │
        |│ 4   ┆ 2.0 ┆ 2    │
        |│ 5   ┆ 2.5 ┆ 2    │
        |└─────┴─────┴──────┘""")
  }

  test("expr.rb mod") {
    val df = DataFrame(Seq(0L, 1L, 2L, 3L, 4L).toDF("x"))
    check(df.withColumns(Seq((col("x") % 2).alias("x%2"))),
      """shape: (5, 2)
        |┌─────┬─────┐
        |│ x   ┆ x%2 │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 0   ┆ 0   │
        |│ 1   ┆ 1   │
        |│ 2   ┆ 0   │
        |│ 3   ┆ 1   │
        |│ 4   ┆ 0   │
        |└─────┴─────┘""")
  }

  test("expr.rb neg keeps the name and nulls") {
    val df = DataFrame(Seq(Option(-1L), Option(0L), Option(2L), Option.empty[Long]).toDF("a"))
    check(df.withColumns(Seq(col("a").neg)),
      """shape: (4, 1)
        |┌──────┐
        |│ a    │
        |│ ---  │
        |│ i64  │
        |╞══════╡
        |│ 1    │
        |│ 0    │
        |│ -2   │
        |│ null │
        |└──────┘""")
  }

  test("expr.rb xor") {
    val df = DataFrame(Seq((true, true), (false, true), (true, false), (false, false))
      .toDF("x", "y"))
    check(df.withColumns(Seq(col("x").xor(col("y")).alias("x ^ y"))),
      """shape: (4, 3)
        |┌───────┬───────┬───────┐
        |│ x     ┆ y     ┆ x ^ y │
        |│ ---   ┆ ---   ┆ ---   │
        |│ bool  ┆ bool  ┆ bool  │
        |╞═══════╪═══════╪═══════╡
        |│ true  ┆ true  ┆ false │
        |│ false ┆ true  ┆ true  │
        |│ true  ┆ false ┆ true  │
        |│ false ┆ false ┆ false │
        |└───────┴───────┴───────┘""")
  }

  test("expr.rb dot keeps the integer dtype") {
    val df = DataFrame(Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("a", "b"))
    check(df.select(col("a").dot(col("b"))),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 44  │
        |└─────┘""")
  }

  test("expr.rb lower_bound / upper_bound") {
    val df = DataFrame(Seq(1L, 2L, 3L, 2L, 1L).toDF("a"))
    check(df.select(col("a").lowerBound(LongType).alias("a")),
      """shape: (1, 1)
        |┌──────────────────────┐
        |│ a                    │
        |│ ---                  │
        |│ i64                  │
        |╞══════════════════════╡
        |│ -9223372036854775808 │
        |└──────────────────────┘""")
    check(df.select(col("a").upperBound(LongType).alias("a")),
      """shape: (1, 1)
        |┌─────────────────────┐
        |│ a                   │
        |│ ---                 │
        |│ i64                 │
        |╞═════════════════════╡
        |│ 9223372036854775807 │
        |└─────────────────────┘""")
  }

  test("expr.rb extend_constant") {
    val df = DataFrame(Seq(1L, 2L, 3L).toDF("values"))
    check(DataFrame(graft.api.Series("values", df.toSpark).extendConstant(99, 2).df),
      """shape: (5, 1)
        |┌────────┐
        |│ values │
        |│ ---    │
        |│ i64    │
        |╞════════╡
        |│ 1      │
        |│ 2      │
        |│ 3      │
        |│ 99     │
        |│ 99     │
        |└────────┘""")
  }

  // ---- tranche 3: expr.rb naming / fills / aggregates ----
  test("expr.rb alias pair") {
    val df = DataFrame(Seq((1L, Option("a")), (2L, Option("b")), (3L, Option.empty[String]))
      .toDF("a", "b"))
    check(df.select(col("a").alias("bar"), col("b").alias("foo")),
      """shape: (3, 2)
        |┌─────┬──────┐
        |│ bar ┆ foo  │
        |│ --- ┆ ---  │
        |│ i64 ┆ str  │
        |╞═════╪══════╡
        |│ 1   ┆ a    │
        |│ 2   ┆ b    │
        |│ 3   ┆ null │
        |└─────┴──────┘""")
  }

  test("expr.rb keep_name after alias") {
    val df = DataFrame(Seq((1L, 3L), (2L, 4L)).toDF("a", "b"))
    check(df.withColumns(Seq((col("a") * 9).alias("c").keepName)),
      """shape: (2, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 9   ┆ 3   │
        |│ 18  ┆ 4   │
        |└─────┴─────┘""")
  }

  test("expr.rb map_alias over all.reverse") {
    val df = DataFrame(Seq((1L, 3L), (2L, 4L)).toDF("A", "B"))
    check(df.reverse.select(
      col("A").mapAlias(_ + "_reverse"),
      col("B").mapAlias(_ + "_reverse")),
      """shape: (2, 2)
        |┌───────────┬───────────┐
        |│ A_reverse ┆ B_reverse │
        |│ ---       ┆ ---       │
        |│ i64       ┆ i64       │
        |╞═══════════╪═══════════╡
        |│ 2         ┆ 4         │
        |│ 1         ┆ 3         │
        |└───────────┴───────────┘""")
  }

  test("expr.rb any / all boolean aggregates") {
    val df = DataFrame(Seq((true, false), (false, false)).toDF("TF", "FF"))
    check(df.select(col("TF").any(), col("FF").any()),
      """shape: (1, 2)
        |┌──────┬───────┐
        |│ TF   ┆ FF    │
        |│ ---  ┆ ---   │
        |│ bool ┆ bool  │
        |╞══════╪═══════╡
        |│ true ┆ false │
        |└──────┴───────┘""")
    val df3 = DataFrame(Seq((true, true, false), (true, false, false)).toDF("TT", "TF", "FF"))
    check(df3.select(col("TT").all(), col("TF").all(), col("FF").all()),
      """shape: (1, 3)
        |┌──────┬───────┬───────┐
        |│ TT   ┆ TF    ┆ FF    │
        |│ ---  ┆ ---   ┆ ---   │
        |│ bool ┆ bool  ┆ bool  │
        |╞══════╪═══════╪═══════╡
        |│ true ┆ false ┆ false │
        |└──────┴───────┴───────┘""")
  }

  private def fillDf = DataFrame(Seq(
    (Option(1L), Option(4L)), (Option(2L), Option.empty[Long]),
    (Option.empty[Long], Option(6L))).toDF("a", "b"))

  test("expr.rb forward_fill / backward_fill; frame fill_null(strategy)") {
    check(fillDf.select(col("a").forwardFill, col("b").forwardFill),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 1   ┆ 4   │
        |│ 2   ┆ 4   │
        |│ 2   ┆ 6   │
        |└─────┴─────┘""")
    check(fillDf.select(col("a").backwardFill, col("b").backwardFill),
      """shape: (3, 2)
        |┌──────┬─────┐
        |│ a    ┆ b   │
        |│ ---  ┆ --- │
        |│ i64  ┆ i64 │
        |╞══════╪═════╡
        |│ 1    ┆ 4   │
        |│ 2    ┆ 6   │
        |│ null ┆ 6   │
        |└──────┴─────┘""")
    check(fillDf.fillNullStrategy("forward"),
      """shape: (3, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 1   ┆ 4   │
        |│ 2   ┆ 4   │
        |│ 2   ┆ 6   │
        |└─────┴─────┘""")
  }

  test("expr.rb nan_max / nan_min propagate NaN") {
    val df = DataFrame(Seq(0.0, Double.NaN).toDF("a"))
    check(df.select(col("a").nanMax),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ NaN │
        |└─────┘""")
    check(df.select(col("a").nanMin),
      """shape: (1, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ f64 │
        |╞═════╡
        |│ NaN │
        |└─────┘""")
  }

  test("expr.rb implode is row-ordered") {
    val df = DataFrame(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("a", "b"))
    check(df.select(col("a").implode, col("b").implode),
      """shape: (1, 2)
        |┌───────────┬───────────┐
        |│ a         ┆ b         │
        |│ ---       ┆ ---       │
        |│ list[i64] ┆ list[i64] │
        |╞═══════════╪═══════════╡
        |│ [1, 2, 3] ┆ [4, 5, 6] │
        |└───────────┴───────────┘""")
  }

  // ---- group_by.rb agg forms ----
  // (group_by without maintain_order is row-order-nondeterministic in the
  // reference — these are its agg goldens run with maintain_order: true, so
  // rows land in first-seen order; the VALUES are verbatim)
  test("group_by.rb agg: implicit implode, suffix naming, agg-of-pow") {
    val df = DataFrame(Seq(
      ("a", 1L, 5L), ("b", 2L, 4L), ("a", 1L, 3L), ("b", 3L, 2L), ("c", 3L, 1L))
      .toDF("a", "b", "c"))
    check(df.groupBy(Seq("a"), maintainOrder = true).agg(col("b"), col("c")),
      """shape: (3, 3)
        |┌─────┬───────────┬───────────┐
        |│ a   ┆ b         ┆ c         │
        |│ --- ┆ ---       ┆ ---       │
        |│ str ┆ list[i64] ┆ list[i64] │
        |╞═════╪═══════════╪═══════════╡
        |│ a   ┆ [1, 1]    ┆ [5, 3]    │
        |│ b   ┆ [2, 3]    ┆ [4, 2]    │
        |│ c   ┆ [3]       ┆ [1]       │
        |└─────┴───────────┴───────────┘""")
    check(df.groupBy(Seq("a"), maintainOrder = true).agg(
      col("b").sum.mapAlias(_ + "_sum"),
      col("c").pow(2).mean.mapAlias(_ + "_mean_squared")),
      """shape: (3, 3)
        |┌─────┬───────┬────────────────┐
        |│ a   ┆ b_sum ┆ c_mean_squared │
        |│ --- ┆ ---   ┆ ---            │
        |│ str ┆ i64   ┆ f64            │
        |╞═════╪═══════╪════════════════╡
        |│ a   ┆ 2     ┆ 17.0           │
        |│ b   ┆ 5     ┆ 10.0           │
        |│ c   ┆ 3     ┆ 1.0            │
        |└─────┴───────┴────────────────┘""")
  }

  test("expr.rb gather/take by index inside group_by.agg") {
    val df = DataFrame(Seq(
      ("one", 1L), ("one", 98L), ("one", 2L), ("two", 3L), ("two", 99L), ("two", 4L))
      .toDF("group", "value"))
    check(df.groupBy(Seq("group"), maintainOrder = true).agg(col("value").take(Seq(2, 1))),
      """shape: (2, 2)
        |┌───────┬───────────┐
        |│ group ┆ value     │
        |│ ---   ┆ ---       │
        |│ str   ┆ list[i64] │
        |╞═══════╪═══════════╡
        |│ one   ┆ [2, 98]   │
        |│ two   ┆ [4, 99]   │
        |└───────┴───────────┘""")
  }

  test("expr.rb repeat_by, log(2), entropy(2) both normalize modes") {
    val rb = DataFrame(Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("a", "n"))
    check(rb.select(col("a").repeatBy(col("n"))),
      """shape: (3, 1)
        |┌─────────────────┐
        |│ a               │
        |│ ---             │
        |│ list[str]       │
        |╞═════════════════╡
        |│ ["x"]           │
        |│ ["y", "y"]      │
        |│ ["z", "z", "z"] │
        |└─────────────────┘""")
    val df = DataFrame(Seq(1L, 2L, 3L).toDF("a"))
    check(df.select(col("a").log(2)),
      """shape: (3, 1)
        |┌──────────┐
        |│ a        │
        |│ ---      │
        |│ f64      │
        |╞══════════╡
        |│ 0.0      │
        |│ 1.0      │
        |│ 1.584963 │
        |└──────────┘""")
    check(df.select(col("a").entropy(2)),
      """shape: (1, 1)
        |┌──────────┐
        |│ a        │
        |│ ---      │
        |│ f64      │
        |╞══════════╡
        |│ 1.459148 │
        |└──────────┘""")
    check(df.select(col("a").entropy(2, normalize = false)),
      """shape: (1, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ f64       │
        |╞═══════════╡
        |│ -6.754888 │
        |└───────────┘""")
  }

  // ---- data_frame.rb ----
  test("data_frame.rb rename and drop") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.withColumnsRenamed(Map("foo" -> "apple")),
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
    val df2 = DataFrame(Seq((1L, 6.0, "a"), (2L, 7.0, "b"), (3L, 8.0, "c"))
      .toDF("foo", "bar", "ham"))
    check(df2.drop("foo", "ham"),
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

  test("data_frame.rb get_column renders a Series") {
    val df = DataFrame(Seq((1L, 4L), (2L, 5L), (3L, 6L)).toDF("foo", "bar"))
    val got = Testing.renderSeries(df.getColumn("foo"))
    assert(got == "shape: (3,)\nSeries: 'foo' [i64]\n[\n\t1\n\t2\n\t3\n]", got)
  }

  test("data_frame.rb fill_null(strategy: zero) keeps each column's dtype") {
    val df = DataFrame(Seq(
      (Option(1L), Option(0.5)), (Option(2L), Option(4.0)),
      (Option.empty[Long], Option.empty[Double]), (Option(4L), Option(13.0)))
      .toDF("a", "b"))
    check(df.fillNullStrategy("zero"),
      """shape: (4, 2)
        |┌─────┬──────┐
        |│ a   ┆ b    │
        |│ --- ┆ ---  │
        |│ i64 ┆ f64  │
        |╞═════╪══════╡
        |│ 1   ┆ 0.5  │
        |│ 2   ┆ 4.0  │
        |│ 0   ┆ 0.0  │
        |│ 4   ┆ 13.0 │
        |└─────┴──────┘""")
  }

  test("data_frame.rb product: ints stay i64, bools numericize") {
    val df = DataFrame(Seq((1L, 0.5, true), (2L, 4.0, true), (3L, 10.0, false))
      .toDF("a", "b", "c"))
    check(df.productFrame,
      """shape: (1, 3)
        |┌─────┬──────┬─────┐
        |│ a   ┆ b    ┆ c   │
        |│ --- ┆ ---  ┆ --- │
        |│ i64 ┆ f64  ┆ i64 │
        |╞═════╪══════╪═════╡
        |│ 6   ┆ 20.0 ┆ 0   │
        |└─────┴──────┴─────┘""")
  }

  test("data_frame.rb quantile keeps non-numeric columns as typed nulls") {
    val df = DataFrame(Seq((1L, 6L, "a"), (2L, 7L, "b"), (3L, 8L, "c"))
      .toDF("foo", "bar", "ham"))
    check(df.quantileFrame(0.5, "nearest"),
      """shape: (1, 3)
        |┌─────┬─────┬──────┐
        |│ foo ┆ bar ┆ ham  │
        |│ --- ┆ --- ┆ ---  │
        |│ f64 ┆ f64 ┆ str  │
        |╞═════╪═════╪══════╡
        |│ 2.0 ┆ 7.0 ┆ null │
        |└─────┴─────┴──────┘""")
  }

  test("data_frame.rb describe: 7 rows, bools numericized, strings stringified") {
    val df = DataFrame(Seq(
      (1.0, Option(4L), true, Option.empty[String], Option("usd")),
      (2.8, Option(5L), false, Option("b"), Option("eur")),
      (3.0, Option.empty[Long], true, Option("c"), Option.empty[String]))
      .toDF("a", "b", "c", "d", "e"))
    check(df.describe(),
      """shape: (7, 6)
        |┌────────────┬──────────┬──────────┬──────────┬──────┬──────┐
        |│ describe   ┆ a        ┆ b        ┆ c        ┆ d    ┆ e    │
        |│ ---        ┆ ---      ┆ ---      ┆ ---      ┆ ---  ┆ ---  │
        |│ str        ┆ f64      ┆ f64      ┆ f64      ┆ str  ┆ str  │
        |╞════════════╪══════════╪══════════╪══════════╪══════╪══════╡
        |│ count      ┆ 3.0      ┆ 3.0      ┆ 3.0      ┆ 3    ┆ 3    │
        |│ null_count ┆ 0.0      ┆ 1.0      ┆ 0.0      ┆ 1    ┆ 1    │
        |│ mean       ┆ 2.266667 ┆ 4.5      ┆ 0.666667 ┆ null ┆ null │
        |│ std        ┆ 1.101514 ┆ 0.707107 ┆ 0.57735  ┆ null ┆ null │
        |│ min        ┆ 1.0      ┆ 4.0      ┆ 0.0      ┆ b    ┆ eur  │
        |│ max        ┆ 3.0      ┆ 5.0      ┆ 1.0      ┆ c    ┆ usd  │
        |│ median     ┆ 2.8      ┆ 4.5      ┆ 1.0      ┆ null ┆ null │
        |└────────────┴──────────┴──────────┴──────────┴──────┴──────┘""")
  }

  test("series.rb describe: numeric and string stat rows render verbatim") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    check(graft.api.Series("", Seq(1L, 2L, 3L, 4L, 5L)).describe(),
      """shape: (6, 2)
        |┌────────────┬──────────┐
        |│ statistic  ┆ value    │
        |│ ---        ┆ ---      │
        |│ str        ┆ f64      │
        |╞════════════╪══════════╡
        |│ min        ┆ 1.0      │
        |│ max        ┆ 5.0      │
        |│ null_count ┆ 0.0      │
        |│ mean       ┆ 3.0      │
        |│ std        ┆ 1.581139 │
        |│ count      ┆ 5.0      │
        |└────────────┴──────────┘""")
    check(graft.api.Series("", Seq[Any]("a", "a", null, "b", "c")).describe(),
      """shape: (3, 2)
        |┌────────────┬───────┐
        |│ statistic  ┆ value │
        |│ ---        ┆ ---   │
        |│ str        ┆ i64   │
        |╞════════════╪═══════╡
        |│ unique     ┆ 4     │
        |│ null_count ┆ 1     │
        |│ count      ┆ 5     │
        |└────────────┴───────┘""")
  }

  test("data_frame.rb pipe") {
    val df = DataFrame(Seq((1L, "10"), (2L, "20"), (3L, "30"), (4L, "40")).toDF("a", "b"))
    val castStrToInt = (d: DataFrame) =>
      d.withColumns(Seq(col("b").cast(LongType)))
    check(df.pipe(castStrToInt),
      """shape: (4, 2)
        |┌─────┬─────┐
        |│ a   ┆ b   │
        |│ --- ┆ --- │
        |│ i64 ┆ i64 │
        |╞═════╪═════╡
        |│ 1   ┆ 10  │
        |│ 2   ┆ 20  │
        |│ 3   ┆ 30  │
        |│ 4   ┆ 40  │
        |└─────┴─────┘""")
  }

  test("list_expr.rb gather with null_on_oob") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq.empty[Long], Seq(1L, 2L, 3L, 4L, 5L)).toDF("a"))
    check(df.withColumns(Seq(
      col("a").list.gather(Seq(0, 4), nullOnOob = true).alias("gather"))),
      """shape: (3, 2)
        |┌─────────────┬──────────────┐
        |│ a           ┆ gather       │
        |│ ---         ┆ ---          │
        |│ list[i64]   ┆ list[i64]    │
        |╞═════════════╪══════════════╡
        |│ [3, 2, 1]   ┆ [3, null]    │
        |│ []          ┆ [null, null] │
        |│ [1, 2, … 5] ┆ [1, 5]       │
        |└─────────────┴──────────────┘""")
  }

  test("expr.rb shrink_dtype") {
    val df = DataFrame(Seq(
      (1L, 1L, -1L, -112L, -112L, "a", 0.1, Option(true)),
      (2L, 2L, 2L, 2L, 2L, "b", 1.32, Option.empty[Boolean]),
      (3L, 2L << 32, 1L << 30, 112L, 129L, "c", 0.12, Option(false)))
      .toDF("a", "b", "c", "d", "e", "f", "g", "h"))
    check(df.shrinkDtype,
      """shape: (3, 8)
        |┌─────┬────────────┬────────────┬──────┬──────┬─────┬──────┬───────┐
        |│ a   ┆ b          ┆ c          ┆ d    ┆ e    ┆ f   ┆ g    ┆ h     │
        |│ --- ┆ ---        ┆ ---        ┆ ---  ┆ ---  ┆ --- ┆ ---  ┆ ---   │
        |│ i8  ┆ i64        ┆ i32        ┆ i8   ┆ i16  ┆ str ┆ f32  ┆ bool  │
        |╞═════╪════════════╪════════════╪══════╪══════╪═════╪══════╪═══════╡
        |│ 1   ┆ 1          ┆ -1         ┆ -112 ┆ -112 ┆ a   ┆ 0.1  ┆ true  │
        |│ 2   ┆ 2          ┆ 2          ┆ 2    ┆ 2    ┆ b   ┆ 1.32 ┆ null  │
        |│ 3   ┆ 8589934592 ┆ 1073741824 ┆ 112  ┆ 129  ┆ c   ┆ 0.12 ┆ false │
        |└─────┴────────────┴────────────┴──────┴──────┴─────┴──────┴───────┘""")
  }
}
