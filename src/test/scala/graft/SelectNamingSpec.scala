package graft

import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** Regression pins for the round-11 polars-naming semantics and the review
  * fixes on top of them (star expansion, duplicate detection, UDF-vs-
  * aggregate classification in the order-restore guard). */
class SelectNamingSpec extends SparkSpec {
  import spark.implicits._

  test("select(col(\"*\")) and Polars.all expand instead of aliasing to 'literal'") {
    val df = DataFrame(Seq((1L, "x"), (2L, "y")).toDF("a", "b"))
    assert(df.select(Polars.col("*")).toSpark.columns.toSeq == Seq("a", "b"))
    assert(df.select(Polars.all).toSpark.count() == 2)
    // star alongside a named expr keeps expanding
    val out = df.select(Polars.all, (Polars.col("a") * 2).alias("a2")).toSpark
    assert(out.columns.toSeq == Seq("a", "b", "a2"))
  }

  test("duplicate default names raise like polars DuplicateError") {
    val df = DataFrame(Seq((1L, 2L)).toDF("a", "b"))
    val e = intercept[IllegalArgumentException](
      df.select(Polars.col("a"), Polars.col("a") + 1))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // distinct aliases pass
    assert(df.select(Polars.col("a"), (Polars.col("a") + 1).alias("a1"))
      .toSpark.columns.toSeq == Seq("a", "a1"))
    // two literals both defaulting to "literal" raise too
    val e2 = intercept[IllegalArgumentException](
      df.select(Polars.lit(1), Polars.lit(2)))
    assert(e2.getMessage.contains("duplicate"))
  }

  test("windowed projection order survives a co-selected non-aggregate function") {
    // a scanned expr attaches the row index; the sibling expr must not be
    // misclassified as an aggregate (which would skip the order restore).
    // repartitionByRange keeps the multi-partition layout consistent with
    // ascending i (a plain repartition would REDEFINE the frame's row order
    // before the index is attached — frame order is whatever the frame
    // materializes as, not the builder Seq)
    val df = DataFrame(Seq.tabulate(40)(i => (i.toLong, (40 - i).toLong))
      .toDF("i", "v").repartitionByRange(5, F.col("i"))
      .sortWithinPartitions("i"))
    // a SESSION-registered UDF is unresolvable in FunctionRegistry.builtin —
    // exactly the shape the old classifier misread as an aggregate
    spark.udf.register("graft_snspec_id", (l: Long) => l)
    val out = df.select(
        Polars.col("i"),
        graft.expr.Expr(F.call_function("graft_snspec_id", F.col("i"))).alias("k"),
        Polars.col("v").cumSum().alias("cs"))
      .toSpark.collect()
    assert(out.map(_.getLong(0)).toSeq == (0L until 40L), "row order lost")
    // cum_sum in row order: prefix sums of 40,39,...
    assert(out(0).getLong(2) == 40L && out(1).getLong(2) == 79L)
  }

  test("group_by maintain_order on head keeps within-group row order") {
    val df = DataFrame(Seq(
      ("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L), ("a", 5L), ("c", 6L))
      .toDF("k", "v").repartitionByRange(3, F.col("v"))
      .sortWithinPartitions("v"))
    val out = df.groupBy(Seq("k"), maintainOrder = true).head(2)
      .toSpark.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("a", 1L), ("b", 2L), ("a", 3L), ("b", 4L), ("c", 6L)), out.toString)
  }

  test("group_by maintain_order rejects unnamed expression keys loudly") {
    val df = DataFrame(Seq(("a", 1L)).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      df.groupByExprs(Seq(Polars.col("v") % 2), maintainOrder = true).count())
    assert(e.getMessage.contains("maintain_order"))
    // aliased expression keys work
    val ok = df.groupByExprs(Seq((Polars.col("v") % 2).alias("m")), maintainOrder = true)
      .count().toSpark
    assert(ok.columns.toSeq == Seq("m", "count"))
  }
}
