package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.testing.Testing

/** Round-14 tranche 13 of the reference `@example` golden corpus:
  * the float scientific-notation renders unlocked by the Rust fmt_float
  * port (series.rb sin/cos/tan — previously a COVERAGE.md exclusion),
  * meta_expr.rb introspection blocks, and array_expr.rb (.arr) blocks
  * (rendered with the documented list[T] dtype-header divergence — Spark
  * has no fixed-width array type, SURVEY §1.2). */
class DocExamples14Spec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sparkSessionForSeries: org.apache.spark.sql.SparkSession = spark

  private def check(df: DataFrame, expected: String): Unit = {
    val got = Testing.render(df.toSpark)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }
  private def checkS(s: Series, expected: String): Unit = {
    val got = Testing.renderSeries(s)
    assert(got == expected.stripMargin.trim,
      s"\n--- rendered ---\n$got\n--- expected ---\n${expected.stripMargin.trim}")
  }

  // ---- series.rb trig goldens (scientific-notation renders) ----

  test("series.rb sin: 1.2246e-16 renders scientific (series.rb:2632)") {
    val s = Series("a", Seq(0.0, math.Pi / 2.0, math.Pi))
    checkS(s.sin,
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t0.0\n\t1.0\n\t1.2246e-16\n]")
  }

  test("series.rb cos: 6.1232e-17 renders scientific (series.rb:2655)") {
    val s = Series("a", Seq(0.0, math.Pi / 2.0, math.Pi))
    checkS(s.cos,
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t1.0\n\t6.1232e-17\n\t-1.0\n]")
  }

  test("series.rb tan: large and small magnitudes both scientific (series.rb:2669)") {
    val s = Series("a", Seq(0.0, math.Pi / 2.0, math.Pi))
    checkS(s.tan,
      "shape: (3,)\nSeries: 'a' [f64]\n[\n\t0.0\n\t1.6331e16\n\t-1.2246e-16\n]")
  }

  // ---- meta_expr.rb introspection blocks ----

  test("meta_expr.rb eq/ne: structural tree equality (meta_expr.rb:30,46)") {
    val fooBar = col("foo").alias("bar")
    val foo = col("foo")
    assert(!fooBar.meta.treeEq(foo))
    val fooBar2 = col("foo").alias("bar")
    assert(fooBar.meta.treeEq(fooBar2))
    assert(fooBar.meta.treeNe(foo))
    assert(!fooBar.meta.treeNe(fooBar2))
  }

  test("meta_expr.rb is_column: regex projections and compositions are not columns (meta_expr.rb:74)") {
    assert(col("foo").meta.isColumn)
    assert(!(col("foo") * col("bar")).meta.isColumn)
    assert(!col("^col.*\\d+$").meta.isColumn)
  }

  test("meta_expr.rb is_regex_projection survives an alias (meta_expr.rb:92)") {
    assert(col("^.*$").alias("bar").meta.isRegexProjection)
    assert(col("^.*$").meta.isRegexProjection)
    assert(!col("foo").meta.isRegexProjection)
  }

  test("meta_expr.rb output_name: first leaf under compositions (meta_expr.rb:104)") {
    assert((col("foo") * col("bar")).meta.outputName.contains("foo"))
    assert(col("foo").filter(col("bar") === 13).meta.outputName.contains("foo"))
    assert(col("foo").sum.over(col("groups")).meta.outputName.contains("foo"))
  }

  test("meta_expr.rb root_names: referenced columns in first-appearance order (meta_expr.rb:142)") {
    assert((col("foo") * col("bar")).meta.rootNames == Seq("foo", "bar"))
    assert(col("foo").filter(col("bar") === 13).meta.rootNames == Seq("foo", "bar"))
    assert(col("foo").sum.over(col("groups")).meta.rootNames == Seq("foo", "groups"))
  }

  test("meta_expr.rb pop: the root's inputs (meta_expr.rb:127)") {
    val e = col("foo").alias("bar")
    val first = e.meta.pop.head
    assert(first.meta.treeEq(col("foo")))
    assert(!first.meta.treeEq(col("bar")))
  }

  test("meta_expr.rb undo_aliases strips renames (meta_expr.rb:163)") {
    assert(col("foo").alias("bar").meta.undoAliases.meta.treeEq(col("foo")))
    val e = col("foo").sum.over(col("bar"))
    assert(e.name.keep.meta.undoAliases.meta.treeEq(e))
  }

  // ---- array_expr.rb (.arr) blocks — list[T] headers per SURVEY §1.2 ----

  test("array_expr.rb arr.min/max/sum (array_expr.rb:16,40,64)") {
    val df = DataFrame(Seq(Seq(1L, 2L), Seq(4L, 3L)).toDF("a"))
    check(df.select(col("a").arr.min),
      """shape: (2, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |│ 3   │
        |└─────┘""")
    check(df.select(col("a").arr.max),
      """shape: (2, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 2   │
        |│ 4   │
        |└─────┘""")
    check(df.select(col("a").arr.sum),
      """shape: (2, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 3   │
        |│ 7   │
        |└─────┘""")
  }

  test("array_expr.rb arr.unique (array_expr.rb:93)") {
    val df = DataFrame(Seq(Seq(1L, 1L, 2L)).toDF("a"))
    check(df.select(col("a").arr.unique),
      """shape: (1, 1)
        |┌───────────┐
        |│ a         │
        |│ ---       │
        |│ list[i64] │
        |╞═══════════╡
        |│ [1, 2]    │
        |└───────────┘""")
  }

  test("array_expr.rb arr.any/all over null elements (array_expr.rb:148,183)") {
    val rows = Seq(
      org.apache.spark.sql.Row(Seq(true, true)),
      org.apache.spark.sql.Row(Seq(false, true)),
      org.apache.spark.sql.Row(Seq(false, false)),
      org.apache.spark.sql.Row(Seq(null, null)),
      org.apache.spark.sql.Row(null))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.BooleanType))))
    val df = DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema))
    val out = df.withColumns(Seq(
      col("a").arr.any.alias("any"), col("a").arr.all.alias("all")))
      .toSpark.select("any", "all").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getBoolean(0),
                 if (r.isNullAt(1)) null else r.getBoolean(1)))
    assert(out.toSeq == Seq(
      (true, true), (true, false), (false, false), (false, true), (null, null)))
  }

  test("array_expr.rb arr.sort asc/desc (array_expr.rb:223,236)") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq(9L, 1L, 2L)).toDF("a"))
    check(df.withColumn("sort", col("a").arr.sort()),
      """shape: (2, 2)
        |┌───────────┬───────────┐
        |│ a         ┆ sort      │
        |│ ---       ┆ ---       │
        |│ list[i64] ┆ list[i64] │
        |╞═══════════╪═══════════╡
        |│ [3, 2, 1] ┆ [1, 2, 3] │
        |│ [9, 1, 2] ┆ [1, 2, 9] │
        |└───────────┴───────────┘""")
    check(df.withColumn("sort", col("a").arr.sort(descending = true)),
      """shape: (2, 2)
        |┌───────────┬───────────┐
        |│ a         ┆ sort      │
        |│ ---       ┆ ---       │
        |│ list[i64] ┆ list[i64] │
        |╞═══════════╪═══════════╡
        |│ [3, 2, 1] ┆ [3, 2, 1] │
        |│ [9, 1, 2] ┆ [9, 2, 1] │
        |└───────────┴───────────┘""")
  }

  test("array_expr.rb arr.reverse (array_expr.rb:262)") {
    val df = DataFrame(Seq(Seq(3L, 2L, 1L), Seq(9L, 1L, 2L)).toDF("a"))
    check(df.withColumn("reverse", col("a").arr.reverse),
      """shape: (2, 2)
        |┌───────────┬───────────┐
        |│ a         ┆ reverse   │
        |│ ---       ┆ ---       │
        |│ list[i64] ┆ list[i64] │
        |╞═══════════╪═══════════╡
        |│ [3, 2, 1] ┆ [1, 2, 3] │
        |│ [9, 1, 2] ┆ [2, 1, 9] │
        |└───────────┴───────────┘""")
  }

  test("array_expr.rb arr.arg_min/arg_max (array_expr.rb:288,314)") {
    val df = DataFrame(Seq(Seq(1L, 2L), Seq(2L, 1L)).toDF("a"))
    val got = df.withColumns(Seq(
      col("a").arr.argMin.alias("arg_min"), col("a").arr.argMax.alias("arg_max")))
      .toSpark.select("arg_min", "arg_max").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((0L, 1L), (1L, 0L)))
  }

  test("array_expr.rb arr.first/last (array_expr.rb:375,400)") {
    val df = DataFrame(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L)).toDF("a"))
    val got = df.withColumns(Seq(
      col("a").arr.first.alias("first"), col("a").arr.last.alias("last")))
      .toSpark.select("first", "last").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L), (4L, 6L), (7L, 9L)))
  }

  test("array_expr.rb arr.explode (array_expr.rb:462)") {
    val df = DataFrame(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)).toDF("a"))
    check(df.select(col("a").arr.explode),
      """shape: (6, 1)
        |┌─────┐
        |│ a   │
        |│ --- │
        |│ i64 │
        |╞═════╡
        |│ 1   │
        |│ 2   │
        |│ 3   │
        |│ 4   │
        |│ 5   │
        |│ 6   │
        |└─────┘""")
  }

  test("array_expr.rb arr.contains (array_expr.rb:493)") {
    val df = DataFrame(Seq(Seq("a", "b"), Seq("x", "y"), Seq("a", "c")).toDF("a"))
    check(df.withColumn("contains", col("a").arr.contains("a")),
      """shape: (3, 2)
        |┌────────────┬──────────┐
        |│ a          ┆ contains │
        |│ ---        ┆ ---      │
        |│ list[str]  ┆ bool     │
        |╞════════════╪══════════╡
        |│ ["a", "b"] ┆ true     │
        |│ ["x", "y"] ┆ false    │
        |│ ["a", "c"] ┆ true     │
        |└────────────┴──────────┘""")
  }

  test("array_expr.rb arr.count_matches (array_expr.rb:521)") {
    val df = DataFrame(Seq(Seq(1L, 2L), Seq(1L, 1L), Seq(2L, 2L)).toDF("a"))
    val got = df.withColumn("number_of_twos", col("a").arr.countMatches(2L))
      .toSpark.select("number_of_twos").collect().map(_.getInt(0))
    assert(got.toSeq == Seq(1, 0, 2))
  }

  test("array_expr.rb arr.join with a string separator (array_expr.rb:438 adapted)") {
    val df = DataFrame(Seq(Seq("a", "b"), Seq("x", "y")).toDF("s"))
    check(df.withColumn("join", col("s").arr.join("*")),
      """shape: (2, 2)
        |┌────────────┬──────┐
        |│ s          ┆ join │
        |│ ---        ┆ ---  │
        |│ list[str]  ┆ str  │
        |╞════════════╪══════╡
        |│ ["a", "b"] ┆ a*b  │
        |│ ["x", "y"] ┆ x*y  │
        |└────────────┴──────┘""")
  }

  test("array_expr.rb arr.get with negative and out-of-bounds indexes (array_expr.rb:349 adapted)") {
    val df = DataFrame(Seq(Seq(1L, 2L, 3L), Seq(4L, 5L, 6L), Seq(7L, 8L, 9L)).toDF("arr"))
    val got = Seq(
      df.select(col("arr").arr.get(1).alias("g")),
      df.select(col("arr").arr.get(-2).alias("g")),
      df.select(col("arr").arr.get(4).alias("g"))).map(
      _.toSpark.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq)
    assert(got(0) == Seq(2L, 5L, 8L))
    assert(got(1) == Seq(2L, 5L, 8L))
    assert(got(2) == Seq(null, null, null))
  }
}
