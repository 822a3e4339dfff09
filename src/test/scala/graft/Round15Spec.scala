package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Round-14 pins for the round-13 advisor items: qcut label-count
  * validation after duplicate-cut merging (polars ShapeError, not silent
  * tail truncation), null-list elements surviving flatten-in-agg,
  * Series.zip_with / dot shape checks, and shift_and_fill's fractional
  * fill promoting integral columns to f64. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  test("qcut: duplicate cuts merging under explicit labels raises (polars ShapeError)") {
    // heavily duplicated values so 0.3/0.5 quantiles land on the SAME cut
    val df = DataFrame((Seq.fill(50)(1.0) ++ Seq.fill(5)(9.0)).toDF("v"))
    val ex = intercept[IllegalArgumentException] {
      df.withColumn("b",
        col("v").qcut(Seq(0.3, 0.5), Some(Seq("a", "b", "c")), allowDuplicates = true))
        .toSpark.collect()
    }
    assert(ex.getMessage.contains("labels required after duplicate"), ex.getMessage)
    // without labels the merged buckets auto-label and succeed
    val ok = df.withColumn("b",
      col("v").qcut(Seq(0.3, 0.5), None, allowDuplicates = true))
      .toSpark.select("b").distinct().count()
    assert(ok >= 1)
  }

  test("flatten in group_by().agg keeps the null element a null list contributes") {
    val df = DataFrame(Seq(
      ("a", Seq("x", "y")), ("a", null.asInstanceOf[Seq[String]]), ("a", Seq("z")),
      ("b", Seq("q"))).toDF("k", "vs"))
    val got = df.groupBy("k").agg(col("vs").flatten.alias("flat"))
      .sortBy(Seq(col("k"))).toSpark.collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    assert(got.toSeq == Seq(
      "a" -> Seq("x", "y", null, "z"),
      "b" -> Seq("q")))
  }

  test("Series.zip_with and dot raise on length mismatch (polars ShapeError)") {
    val s = Series("a", Seq(1.0, 2.0, 3.0).toDF("a"))
    val short = Series("b", Seq(1.0, 2.0).toDF("b"))
    val mask3 = Series("m", Seq(true, false, true).toDF("m"))
    val mask2 = Series("m", Seq(true, false).toDF("m"))
    assert(intercept[IllegalArgumentException](s.dot(short))
      .getMessage.contains("length"))
    assert(intercept[IllegalArgumentException](s.zipWith(mask2, s))
      .getMessage.contains("length"))
    assert(intercept[IllegalArgumentException](s.zipWith(mask3, short))
      .getMessage.contains("length"))
    // equal lengths still compute
    assert(s.dot(s) == 14.0)
    assert(s.zipWith(mask3, Series("c", Seq(9.0, 9.0, 9.0).toDF("c")))
      .toList == List(1.0, 9.0, 3.0))
  }

  test("Series Utf8 + Utf8 concatenates (polars ChunkedArray<Utf8> add impl)") {
    val a = Series("a", Seq("x", "y").toDF("a"))
    val b = Series("b", Seq("1", "2").toDF("b"))
    assert((a + b).toList == List("x1", "y2"))
    val n = Series("n", Seq(1L, 2L).toDF("n"))
    assert((n + n).toList == List(2L, 4L))
  }

  test("shift_and_fill: fractional fill over an integral column promotes to f64") {
    val df = DataFrame(Seq(1L, 2L, 3L).toDF("v"))
    val out = df.select(col("v").shiftAndFill(1, 2.5).alias("s")).toSpark
    assert(out.schema("s").dataType == DoubleType)
    assert(out.collect().map(_.getDouble(0)).toSeq == Seq(2.5, 1.0, 2.0))
    // integral fill over an integral column keeps the column dtype
    val keep = df.select(col("v").shiftAndFill(1, 7).alias("s")).toSpark
    assert(keep.schema("s").dataType == LongType)
    assert(keep.collect().map(_.getLong(0)).toSeq == Seq(7L, 1L, 2L))
  }
}
