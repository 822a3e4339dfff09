package graft

import graft.Polars._
import graft.api.DataFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-15 tranche: the user-guide pipeline remainder
  * (test/guide_test.rb:44-390 — the reference only smoke-renders these, so
  * the values asserted here are derived from polars 0.41 semantics already
  * pinned elsewhere in this suite: count excludes nulls, n_unique counts
  * null as a value, sum of an all-null group is 0, sort defaults
  * nulls-first, scalar aggregates BROADCAST against full-length columns in
  * select/with_columns contexts). */
class Guide2Spec extends SparkSpec {
  import spark.implicits._

  private def exprDf = DataFrame(Seq(
    (Option(1L), Option("foo"), 0.1, "A"),
    (Option(2L), Option("ham"), 0.2, "A"),
    (Option(3L), Option("spam"), 0.3, "B"),
    (Option.empty[Long], Option("egg"), 0.4, "C"),
    (Option(5L), Option.empty[String], 0.5, "B"))
    .toDF("nrs", "names", "random", "groups"))

  private def fruitsDf = DataFrame(Seq(
    (1L, "banana", 5L, "beetle", Option(28L)),
    (2L, "banana", 4L, "audi", Option(300L)),
    (3L, "apple", 3L, "beetle", Option.empty[Long]),
    (4L, "apple", 2L, "beetle", Option(2L)),
    (5L, "banana", 1L, "beetle", Option(-30L)))
    .toDF("A", "fruits", "B", "cars", "optional"))

  test("guide expressions: n_unique counts null, unique.count does not (guide_test.rb:56)") {
    val u1 = exprDf.select(col("names").nUnique.alias("unique_names_1"))
      .toSpark.collect()(0)
    assert(u1.getLong(0) == 5L, "n_unique: null is a distinct value")
    // polars spells unique.count in ONE expr; the relational Expr surface
    // does not nest aggregates (vertical-op chaining, COVERAGE.md) — the
    // equivalent two-step select
    val u2 = exprDf.select(col("names").unique)
      .select(col("names").count.alias("unique_names_2"))
      .toSpark.collect()(0)
    assert(u2.getLong(0) == 4L, "count over unique skips the null")
  }

  test("guide expressions: filter-then-count aggregate (guide_test.rb:70)") {
    val out = exprDf.select(
      col("names").filter(col("names").str.contains("am$")).count.alias("n"))
      .toSpark.collect()(0)
    assert(out.getLong(0) == 2L) // ham, spam
  }

  test("guide expressions: when/then scalar-aggregate product broadcasts (guide_test.rb:74)") {
    // (when(random > 0.5).then(0).otherwise(random)) * sum("nrs") — the
    // sum is a SCALAR inside an elementwise product: polars broadcasts it
    val out = exprDf.select(
      (when(col("random") > 0.5).`then`(Expr.lit(0.0)).otherwise(col("random"))
        * Polars.sum("nrs")).alias("literal"))
      .toSpark.collect().map(_.getDouble(0))
    assert(out.length == 5)
    val expect = Seq(0.1, 0.2, 0.3, 0.4, 0.5).map(_ * 11)
    out.zip(expect).foreach { case (g, w) => assert(math.abs(g - w) < 1e-9, s"$g vs $w") }
  }

  test("guide contexts: scalar aggregates broadcast against full columns in select (guide_test.rb:93)") {
    val out = exprDf.select(
      Polars.sum("nrs"),
      col("names").sort(),
      col("names").first.alias("first name"),
      (Polars.mean("nrs") * 10).alias("10xnrs"))
      .toSpark.collect()
    assert(out.length == 5, "scalar aggs broadcast to the frame height")
    assert(out.map(_.getLong(0)).toSeq == Seq.fill(5)(11L))
    // polars sort: nulls first
    assert(out.map(r => if (r.isNullAt(1)) null else r.getString(1)).toSeq ==
      Seq(null, "egg", "foo", "ham", "spam"))
    assert(out.map(_.getString(2)).toSeq == Seq.fill(5)("foo"))
    out.map(_.getDouble(3)).foreach(v => assert(math.abs(v - 27.5) < 1e-9))
  }

  test("guide contexts: scalar aggregates broadcast in with_columns (guide_test.rb:100)") {
    val out = fruitsDf.withColumns(Seq(
      Polars.sum("A").alias("A_sum"),
      col("B").count.alias("count")))
      .toSpark.collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(5)).toSeq == Seq.fill(5)(15L))
    assert(out.map(_.getLong(6)).toSeq == Seq.fill(5)(5L))
  }

  test("guide contexts: group agg with filtered sum and reversed list (guide_test.rb:105)") {
    val out = exprDf.groupBy("groups").agg(
      Polars.sum("nrs"),
      col("random").count.alias("count"),
      col("random").filter(col("names").isNotNull).sum.suffix("_sum"),
      col("names").reverse.alias("reversed names"))
      .sortBy(Seq(col("groups")))
      .toSpark.collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(out.map(_.getLong(1)).toSeq == Seq(3L, 8L, 0L)) // all-null group sums to 0
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 1L))
    val sums = out.map(_.getDouble(3))
    assert(math.abs(sums(0) - 0.3) < 1e-9 && math.abs(sums(1) - 0.3) < 1e-9 &&
      math.abs(sums(2) - 0.4) < 1e-9)
    assert(out(0).getSeq[String](4) == Seq("ham", "foo"))
    assert(out(1).getSeq[String](4) == Seq(null, "spam"))
  }

  test("guide examples: regex projection sum + all/reverse suffix (guide_test.rb:152,160)") {
    val s = fruitsDf.select(Polars.col("^A|B$").sum)
      .toSpark.collect()(0)
    assert(s.getLong(0) == 15L && s.getLong(1) == 15L)

    // all.reverse carries a scan prep, so the selector expands explicitly
    // (expandSelector's directed error covers the one-step spelling)
    val rev = fruitsDf.select(
      (fruitsDf.columns.map(c => col(c)) ++
        fruitsDf.columns.map(c => col(c).reverse.suffix("_reverse"))): _*)
    assert(rev.columns == Seq("A", "fruits", "B", "cars", "optional",
      "A_reverse", "fruits_reverse", "B_reverse", "cars_reverse", "optional_reverse"))
    val rows = rev.toSpark.collect()
    assert(rows.map(_.getLong(5)).toSeq == Seq(5L, 4L, 3L, 2L, 1L))
  }

  test("guide examples: filtered sums compose in one select (guide_test.rb:174)") {
    val out = fruitsDf.select(
      col("A").filter(col("fruits").str.contains("^b.*")).sum,
      (col("B").filter(col("cars").str.contains("^b.*")).sum * col("B").sum)
        .alias("some_compute()"))
      .toSpark.collect()(0)
    assert(out.getLong(0) == 8L)   // A over banana rows: 1 + 2 + 5
    assert(out.getLong(1) == 165L) // (5+3+2+1) * 15
  }

  test("guide examples: elementwise compute against a scalar sum (guide_test.rb:180)") {
    val someVar = 1.0
    val out = fruitsDf.select(
      ((col("A") / Expr.lit(124.0) * col("B")) / Polars.sum("B") * someVar)
        .alias("computed"))
      .toSpark.collect().map(_.getDouble(0))
    assert(out.length == 5)
    val a = Seq(1.0, 2, 3, 4, 5); val b = Seq(5.0, 4, 3, 2, 1)
    out.zip(a.zip(b)).foreach { case (g, (x, y)) =>
      assert(math.abs(g - x / 124.0 * y / 15.0) < 1e-12) }
  }

  test("guide group agg: reversed key column explodes back to rows (guide_test.rb:205)") {
    val out = fruitsDf.sortBy(Seq(col("cars"))).groupBy("fruits").agg(
      col("B").sum.alias("B_sum"),
      Polars.first("fruits").alias("fruits_first"),
      col("A").count.alias("count"),
      col("cars").reverse)
      .sortBy(Seq(col("fruits")))
      .explode("cars")
      .toSpark.collect()
    assert(out.length == 5)
    val apple = out.filter(_.getString(0) == "apple")
    assert(apple.map(_.getLong(1)).toSeq == Seq(5L, 5L))
    assert(apple.map(_.getString(4)).toSeq == Seq("beetle", "beetle"))
    val banana = out.filter(_.getString(0) == "banana")
    assert(banana.head.getLong(3) == 3L)
  }

  test("guide group agg: shift_and_fill inside agg with its own sum (guide_test.rb:258)") {
    val out = fruitsDf.groupBy("fruits").agg(
      col("B").shiftAndFill(1, 0L).alias("shifted"),
      col("B").shiftAndFill(1, 0L).sum.alias("shifted_sum"))
      .sortBy(Seq(col("fruits")))
      .toSpark.collect()
    assert(out(0).getString(0) == "apple")
    assert(out(0).getSeq[Long](1) == Seq(0L, 3L) && out(0).getLong(2) == 3L)
    assert(out(1).getSeq[Long](1) == Seq(0L, 5L, 4L) && out(1).getLong(2) == 9L)
  }

  test("guide list context: concat_list + reverse rank pct (guide_test.rb:120)") {
    val grades = DataFrame(Seq(
      ("bas", 10L, 4L, 8L), ("laura", 5L, 6L, 4L),
      ("tim", 6L, 2L, 9L), ("jenny", 8L, 7L, 7L))
      .toDF("student", "arithmetic", "biology", "geography"))
    val withAll = grades.withColumn("all_grades",
      Polars.concatList(col("arithmetic"), col("biology"), col("geography")))
    // rank_pct = element.rank(reverse) / count — reverse rank spelled as
    // (len + 1 - ascending rank), the method polars uses is "average"
    val len = col("all_grades").list.len
    val out = withAll.select(
      col("student"),
      col("all_grades").list.rank("average")
        .list.eval(r => (len + 1L - r) / len)
        .alias("grades_rank"))
      .toSpark.collect()
    val jenny = out.find(_.getString(0) == "jenny").get.getSeq[Double](1)
    assert(jenny.map(v => math.rint(v * 600) / 600) ==
      Seq(1.0 / 3, 2.5 / 3, 2.5 / 3).map(v => math.rint(v * 600) / 600))
    val bas = out.find(_.getString(0) == "bas").get.getSeq[Double](1)
    assert(bas == Seq(1.0 / 3, 1.0, 2.0 / 3))
  }

  test("guide missing data: fill strategies, median fill, interpolate, fill_nan mean (guide_test.rb:330)") {
    val df = DataFrame(Seq(
      (1L, Option(1L)), (2L, Option.empty[Long]), (3L, Option(3L)))
      .toDF("col1", "col2"))
    assert(df.nullCount.toSpark.collect()(0).toSeq == Seq(0L, 1L))

    val fwd = df.withColumn("col2", col("col2").forwardFill)
      .toSpark.collect().map(_.getLong(1))
    assert(fwd.toSeq == Seq(1L, 1L, 3L))

    val med = df.withColumn("col2", col("col2").fillNull(Polars.median("col2")))
      .toSpark.collect().map(_.getDouble(1))
    assert(med.toSeq == Seq(1.0, 2.0, 3.0))

    val interp = df.withColumn("col2", col("col2").interpolate())
      .toSpark.collect().map(_.getDouble(1))
    assert(interp.toSeq == Seq(1.0, 2.0, 3.0))

    val nan = DataFrame(Seq(1.0, Double.NaN, Double.NaN, 3.0).toDF("value"))
    val m = nan.withColumn("value", col("value").fillNan(Expr.lit(null)))
      .select(col("value").mean.alias("value"))
      .toSpark.collect()(0).getDouble(0)
    assert(m == 2.0)
  }

  test("guide strings: lengths and negated regex filter (guide_test.rb:310)") {
    val shakespeare = DataFrame(
      "All that glitters is not gold".split(" ").toSeq.toDF("shakespeare"))
    val lens = shakespeare.withColumn("letter_count", col("shakespeare").str.lenChars)
      .toSpark.collect().map(_.getLong(1))
    assert(lens.toSeq == Seq(3L, 4L, 8L, 2L, 3L, 4L))

    val words = DataFrame("The man that ate a whole cake".split(" ").toSeq.toDF("a"))
    val kept = words.filter(col("a").str.contains("(?i)^the$|^a$").isNot)
      .toSpark.collect().map(_.getString(0))
    assert(kept.toSeq == Seq("man", "that", "ate", "whole", "cake"))
  }
}
