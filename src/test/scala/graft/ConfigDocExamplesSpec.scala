package graft

import graft.api.{Config, DataFrame}
import graft.testing.Testing

/** config.rb slice of the reference `@example` golden corpus: the display
  * options (ascii outlines, string-length limit, cell alignment, row/column
  * elision, inline dtypes) rendered verbatim. Each test scopes its override
  * with Config.scoped so the corpus defaults are restored. */
class ConfigDocExamplesSpec extends SparkSpec {
  import spark.implicits._

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  private lazy val abcXyz =
    DataFrame(Seq((1.0, true), (2.5, false), (5.0, true)).toDF("abc", "xyz"))

  test("config.rb ascii_tables: ASCII outlines, condensed header separator") {
    Config.scoped(ascii = true) {
      check(abcXyz,
        """shape: (3, 2)
          |+-----+-------+
          || abc | xyz   |
          || --- | ---   |
          || f64 | bool  |
          |+=============+
          || 1.0 | true  |
          || 2.5 | false |
          || 5.0 | true  |
          |+-----+-------+""")
    }
  }

  test("config.rb fmt_str_lengths: 50-char cells render unclipped") {
    val df = DataFrame(Seq(
      "Play it, Sam. Play 'As Time Goes By'.",
      "This is the beginning of a beautiful friendship.").toDF("txt"))
    Config.scoped(strLengths = 50) {
      check(df,
        """shape: (2, 1)
          |┌──────────────────────────────────────────────────┐
          |│ txt                                              │
          |│ ---                                              │
          |│ str                                              │
          |╞══════════════════════════════════════════════════╡
          |│ Play it, Sam. Play 'As Time Goes By'.            │
          |│ This is the beginning of a beautiful friendship. │
          |└──────────────────────────────────────────────────┘""")
    }
  }

  test("config.rb tbl_cell_alignment RIGHT") {
    val df = DataFrame(Seq((1.0, true), (2.5, false), (5.0, true))
      .toDF("column_abc", "column_xyz"))
    Config.scoped(cellAlignment = "RIGHT") {
      check(df,
        """shape: (3, 2)
          |┌────────────┬────────────┐
          |│ column_abc ┆ column_xyz │
          |│        --- ┆        --- │
          |│        f64 ┆       bool │
          |╞════════════╪════════════╡
          |│        1.0 ┆       true │
          |│        2.5 ┆      false │
          |│        5.0 ┆       true │
          |└────────────┴────────────┘""")
    }
  }

  test("config.rb tbl_rows(2): head 1 / ellipsis / tail 1") {
    val df = DataFrame(Seq((1.0, true), (2.5, false), (3.5, true), (5.0, false))
      .toDF("abc", "xyz"))
    Config.scoped(rows = 2) {
      check(df,
        """shape: (4, 2)
          |┌─────┬───────┐
          |│ abc ┆ xyz   │
          |│ --- ┆ ---   │
          |│ f64 ┆ bool  │
          |╞═════╪═══════╡
          |│ 1.0 ┆ true  │
          |│ …   ┆ …     │
          |│ 5.0 ┆ false │
          |└─────┴───────┘""")
    }
  }

  test("config.rb tbl_cols(5): column elision with the … column") {
    val row = org.apache.spark.sql.Row.fromSeq((0 until 100).map(_.toLong))
    val schema = org.apache.spark.sql.types.StructType((0 until 100).map(i =>
      org.apache.spark.sql.types.StructField(i.toString, org.apache.spark.sql.types.LongType)))
    val df = DataFrame(spark.createDataFrame(
      java.util.Arrays.asList(row), schema))
    Config.scoped(cols = 5) {
      check(df,
        """shape: (1, 100)
          |┌─────┬─────┬─────┬───┬─────┬─────┐
          |│ 0   ┆ 1   ┆ 2   ┆ … ┆ 98  ┆ 99  │
          |│ --- ┆ --- ┆ --- ┆   ┆ --- ┆ --- │
          |│ i64 ┆ i64 ┆ i64 ┆   ┆ i64 ┆ i64 │
          |╞═════╪═════╪═════╪═══╪═════╪═════╡
          |│ 0   ┆ 1   ┆ 2   ┆ … ┆ 98  ┆ 99  │
          |└─────┴─────┴─────┴───┴─────┴─────┘""")
    }
  }

  test("config.rb tbl_column_data_type_inline: dtype in the header, no --- rows") {
    Config.scoped(dataTypeInline = true) {
      check(abcXyz,
        """shape: (3, 2)
          |┌───────────┬────────────┐
          |│ abc (f64) ┆ xyz (bool) │
          |╞═══════════╪════════════╡
          |│ 1.0       ┆ true       │
          |│ 2.5       ┆ false      │
          |│ 5.0       ┆ true       │
          |└───────────┴────────────┘""")
    }
  }

  test("config.rb tbl_hide_column_names: dtype header only") {
    Config.scoped(hideColumnNames = true) {
      check(abcXyz,
        """shape: (3, 2)
          |┌─────┬───────┐
          |│ f64 ┆ bool  │
          |╞═════╪═══════╡
          |│ 1.0 ┆ true  │
          |│ 2.5 ┆ false │
          |│ 5.0 ┆ true  │
          |└─────┴───────┘""")
    }
  }

  test("config.rb tbl_hide_dtype_separator: no --- row") {
    Config.scoped(hideDtypeSeparator = true) {
      check(abcXyz,
        """shape: (3, 2)
          |┌─────┬───────┐
          |│ abc ┆ xyz   │
          |│ f64 ┆ bool  │
          |╞═════╪═══════╡
          |│ 1.0 ┆ true  │
          |│ 2.5 ┆ false │
          |│ 5.0 ┆ true  │
          |└─────┴───────┘""")
    }
  }

  test("config.rb tbl_hide_dataframe_shape / tbl_dataframe_shape_below") {
    Config.scoped(hideDataframeShape = true) {
      check(abcXyz,
        """┌─────┬───────┐
          |│ abc ┆ xyz   │
          |│ --- ┆ ---   │
          |│ f64 ┆ bool  │
          |╞═════╪═══════╡
          |│ 1.0 ┆ true  │
          |│ 2.5 ┆ false │
          |│ 5.0 ┆ true  │
          |└─────┴───────┘""")
    }
    Config.scoped(dataframeShapeBelow = true) {
      check(abcXyz,
        """┌─────┬───────┐
          |│ abc ┆ xyz   │
          |│ --- ┆ ---   │
          |│ f64 ┆ bool  │
          |╞═════╪═══════╡
          |│ 1.0 ┆ true  │
          |│ 2.5 ┆ false │
          |│ 5.0 ┆ true  │
          |└─────┴───────┘
          |shape: (3, 2)""")
    }
  }

  test("config.rb tbl_formatting ASCII_MARKDOWN with hidden dtypes and shape") {
    val df = DataFrame(Seq((-2.5, "hello", true), (5.0, "world", false))
      .toDF("abc", "mno", "xyz"))
    Config.scoped(formatting = "ASCII_MARKDOWN", hideColumnDataTypes = true,
      hideDataframeShape = true) {
      // '#' margin: the pipe-table's own leading '|' must survive stripMargin
      val expected =
        """#| abc  | mno   | xyz   |
          #|------|-------|-------|
          #| -2.5 | hello | true  |
          #| 5.0  | world | false |""".stripMargin('#').trim
      val got = Testing.render(df.toSpark)
      assert(got == expected, s"\n--- rendered ---\n$got\n--- expected ---\n$expected")
    }
  }
}
