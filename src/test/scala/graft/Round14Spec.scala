package graft

import graft.Polars._
import graft.api.{DataFrame, LazyFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Round-13 pins for the round-12 advisor items: Series.sum identity,
  * shortcut-agg parity with the Expr spellings (all-null sum 0, NaN-skipping
  * extrema with all-NaN→NaN fallback), Series-surface cut field names
  * (series.rb:919 rename_fields), and the calendar rolling empty-window sum
  * identity through DecimalDiscipline's cast-wrapped spelling. */
class Round14Spec extends SparkSpec {
  import spark.implicits._

  private val nan = Double.NaN

  test("Series.sum identity: empty and all-null sum to 0 (expr.rb:2713)") {
    val empty = Series("x", Seq.empty[Double].toDF("x"))
    assert(empty.sum == 0.0)
    val allNull = Series("x", Seq[Option[Double]](None, None).toDF("x"))
    assert(allNull.sum == 0.0)
    val ints = Series("x", Seq[Option[Long]](None, None).toDF("x"))
    assert(ints.sum == 0L)
  }

  test("extrema: NaN skipped while values exist, all-NaN yields NaN, all-null stays null") {
    val s = Series("x", Seq(1.0, nan, 3.0).toDF("x"))
    assert(s.min == 1.0 && s.max == 3.0)
    val allNan = Series("x", Seq(nan, nan).toDF("x"))
    assert(allNan.min.asInstanceOf[Double].isNaN)
    assert(allNan.max.asInstanceOf[Double].isNaN)
    val allNull = Series("x", Seq[Option[Double]](None, None).toDF("x"))
    assert(allNull.min == null && allNull.max == null)
  }

  test("group_by().agg extrema: per-group all-NaN fallback to NaN") {
    val df = DataFrame(Seq(("a", 1.0), ("a", nan), ("b", nan), ("b", nan),
      ("c", 5.0)).toDF("k", "v"))
    val got = df.groupBy("k").agg(col("v").min.alias("mn"), col("v").max.alias("mx"))
      .toSpark.orderBy("k").collect()
    assert(got(0).getDouble(1) == 1.0 && got(0).getDouble(2) == 1.0)
    assert(got(1).getDouble(1).isNaN && got(1).getDouble(2).isNaN)
    assert(got(2).getDouble(1) == 5.0 && got(2).getDouble(2) == 5.0)
  }

  test("GroupBy shortcuts share the Expr semantics: sum 0 for all-null, NaN-skip extrema") {
    val df = DataFrame(Seq(
      ("a", Some(1.0)), ("a", Some(nan)), ("b", None), ("b", None))
      .map { case (k, v) => (k, v.map(Double.box).orNull) }.toDF("k", "v"))
    val sums = df.groupBy("k").sum().toSpark.orderBy("k").collect()
    assert(sums(1).getDouble(1) == 0.0) // all-null group: identity 0, not null
    val mins = df.groupBy("k").min().toSpark.orderBy("k").collect()
    assert(mins(0).getDouble(1) == 1.0) // NaN skipped
    assert(mins(1).isNullAt(1))         // all-null group stays null
    val maxs = df.groupBy("k").max().toSpark.orderBy("k").collect()
    assert(maxs(0).getDouble(1) == 1.0)
  }

  test("frame-level sum/min/max share the identities") {
    val df = DataFrame(Seq[(Option[Double], Option[Double])](
      (None, Some(nan)), (None, Some(nan))).map { case (a, b) =>
      (a.map(Double.box).orNull, b.map(Double.box).orNull) }.toDF("a", "b"))
    val s = df.sumFrame.toSpark.collect()(0)
    assert(s.getDouble(0) == 0.0) // all-null sums to 0
    val mn = df.minFrame.toSpark.collect()(0)
    assert(mn.isNullAt(0))        // all-null min stays null
    assert(mn.getDouble(1).isNaN) // all-NaN min is NaN, not null
  }

  test("Series.cut(include_breaks:) renames struct fields to break_point/category (series.rb:919)") {
    val s = Series("foo", Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    val cut = s.cut(Seq(-1.0, 1.0), includeBreaks = true)
    val fields = cut.dtype.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(fields.toSeq == Seq("break_point", "category"))
    val rows = cut.df.select(
      F.col("foo").getField("break_point"), F.col("foo").getField("category")).collect()
    assert(rows.map(_.getDouble(0)).toSeq ==
      Seq(-1.0, -1.0, 1.0, 1.0, Double.PositiveInfinity))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("(-inf, -1]", "(-inf, -1]", "(-1, 1]", "(-1, 1]", "(1, inf]"))
    // the Expr surface keeps polars' documented {breakpoint, category}
    val exprFields = Series("foo", Seq(0L).toDF("foo"))
      .map(_.cut(Seq(1.0), includeBreaks = true))
      .dtype.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(exprFields.toSeq == Seq("breakpoint", "category"))
  }

  test("Series.qcut(include_breaks:) golden values (series.rb:974)") {
    val s = Series("foo", Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    val cut = s.qcut(Seq(0.25, 0.75), includeBreaks = true)
    val fields = cut.dtype.asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames
    assert(fields.toSeq == Seq("break_point", "category"))
    val rows = cut.df.select(
      F.col("foo").getField("break_point"), F.col("foo").getField("category")).collect()
    assert(rows.map(_.getDouble(0)).toSeq ==
      Seq(-1.0, -1.0, 1.0, 1.0, Double.PositiveInfinity))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("(-inf, -1]", "(-inf, -1]", "(-1, 1]", "(-1, 1]", "(1, inf]"))
  }

  test("Series.qcut uniform k with left_closed (series.rb:961)") {
    val s = Series("foo", Seq(-2L, -1L, 0L, 1L, 2L).toDF("foo"))
    val got = s.qcut(2, Some(Seq("low", "high")), leftClosed = true,
      allowDuplicates = false, includeBreaks = false).toList
    assert(got == List("low", "low", "high", "high", "high"))
  }

  test("qcut duplicate quantile values: DuplicateError unless allow_duplicates") {
    val s = Series("x", Seq(1.0, 1.0, 1.0, 1.0).toDF("x"))
    val err = intercept[IllegalArgumentException](
      s.qcut(Seq(0.25, 0.5), None).toList)
    assert(err.getMessage.contains("duplicate quantile values"))
    val merged = s.qcut(Seq(0.25, 0.5), None, leftClosed = false,
      allowDuplicates = true, includeBreaks = false).toList
    assert(merged == List("(-inf, 1]", "(-inf, 1]", "(-inf, 1]", "(-inf, 1]"))
  }

  test("cut propagates null values (elementwise contract)") {
    val s = Series("x", Seq[Option[Double]](None, Some(1.0))
      .map(_.map(Double.box).orNull).toDF("x"))
    assert(s.cut(Seq(0.0)).toList == List(null, "(0, inf]"))
    val withBreaks = s.cut(Seq(0.0), includeBreaks = true).df.collect()
    assert(withBreaks(0).isNullAt(0) ||
      withBreaks(0).getStruct(0).isNullAt(1)) // null value -> null fields
  }

  test("calendar rolling: cast-wrapped decimal sum keeps the empty-window identity 0") {
    def at(s: String) = java.sql.Timestamp.valueOf(s)
    val df = LazyFrame(Seq(
      (at("2024-01-15 00:00:00"), 2.5), (at("2024-03-15 00:00:00"), 4.5))
      .toDF("ts", "v"))
    // closed="left" excludes the current row -> both windows are empty
    val decSum = col("v").cast(DecimalType(18, 2)).sum.cast(DoubleType)
    val cal = df.rolling("ts", "1mo", closed = "left").agg("s" -> decSum)
      .toSpark.orderBy("ts").collect()
    assert(cal.map(_.getDouble(1)).toSeq == Seq(0.0, 0.0),
      s"calendar path: ${cal.mkString(",")}")
    // parity with the fixed-duration path on the same shape
    val fixed = df.rolling("ts", "10d", closed = "left").agg("s" -> decSum)
      .toSpark.orderBy("ts").collect()
    assert(fixed.map(_.getDouble(1)).toSeq == Seq(0.0, 0.0),
      s"fixed path: ${fixed.mkString(",")}")
  }
}
