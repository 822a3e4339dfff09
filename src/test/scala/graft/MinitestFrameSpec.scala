package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import org.apache.spark.sql.types._

/** Round-13 port of the reference minitest tranche (test/data_frame_test.rb)
  * — value/dtype assertions on joins (null keys, full-join suffix, cross),
  * frame-row masks, frame aggregates with ddof, drop_in_place, and replace
  * (incl. the column-valued default). */
class MinitestFrameSpec extends SparkSpec {
  import spark.implicits._

  test("test_join: duplicate right keys fan out in order") {
    val df = DataFrame(Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("a", "b"))
    val other = DataFrame(Seq((1L, "c1"), (1L, "c2"), (2L, "c3")).toDF("a", "c"))
    val got = df.join(other, Seq("a"), "inner").sortBy(Seq(col("a"), col("c"))).toSpark.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq((1L, "one", "c1"), (1L, "one", "c2"), (2L, "two", "c3")))
  }

  test("test_join_nulls: null keys drop by default, match with join_nulls") {
    val df1 = DataFrame(Seq((Some(1L), 4L), (Some(2L), 4L), (None, 4L))
      .map { case (a, b) => (a.map(Long.box).orNull, b) }.toDF("a", "b"))
    val df2 = DataFrame(Seq((None, 5L), (Some(2L), 5L), (Some(3L), 5L))
      .map { case (a, c) => (a.map(Long.box).orNull, c) }.toDF("a", "c"))
    val inner = df1.join(df2, Seq("a"), "inner").toSpark.collect()
    assert(inner.map(_.getLong(0)).toSeq == Seq(2L))
    val withNulls = df1.join(df2, Seq("a"), "inner", joinNulls = true)
      .sortBy(Seq(col("a"))).toSpark.collect()
    assert(withNulls.length == 2)
    assert(withNulls.map(r => Option(r.get(0))).toSeq == Seq(None, Some(2L)))
    assert(withNulls.map(_.getLong(1)).toSeq == Seq(4L, 4L))
    assert(withNulls.map(_.getLong(2)).toSeq == Seq(5L, 5L))
  }

  test("test_join_outer: full join keeps both key columns with the _right suffix") {
    val df1 = DataFrame(Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("L1", "L2"))
    val df2 = DataFrame(Seq(("a", 7L), ("c", 8L), ("d", 9L)).toDF("L1", "R2"))
    val got = df1.join(df2, Seq("L1"), "full")
    assert(got.toSpark.columns.toSeq == Seq("L1", "L2", "L1_right", "R2"))
    val rows = got.sortBy(Seq(col("L1")), nullsLast = true).toSpark.collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toSeq
    assert(rows == Seq(
      (Some("a"), Some(1L), Some("a"), Some(7L)),
      (Some("b"), Some(2L), None, None),
      (Some("c"), Some(3L), Some("c"), Some(8L)),
      (None, None, Some("d"), Some(9L))))
  }

  test("test_join_cross values") {
    val df1 = DataFrame(Seq(1L, 2L).toDF("a"))
    val df2 = DataFrame(Seq("three", "four").toDF("b"))
    val got = df1.crossJoin(df2).sortBy(Seq(col("a"), col("b")), descending = Seq(false, true))
      .toSpark.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "three"), (1L, "four"), (2L, "three"), (2L, "four")))
  }

  test("test_is_duplicated / test_is_unique over whole rows") {
    val df = DataFrame(Seq((1L, "x"), (2L, "y"), (3L, "z"), (1L, "x")).toDF("a", "b"))
    assert(df.isDuplicatedRows.toList == List(true, false, false, true))
    assert(df.isUniqueRows.toList == List(false, true, true, false))
  }

  test("test_max / test_min frame-level and horizontal (axis 1)") {
    val df = DataFrame(Seq((1L, 4L), (5L, 2L), (3L, 6L)).toDF("a", "b"))
    val mx = df.maxFrame.toSpark.collect()(0)
    assert(mx.getLong(0) == 5L && mx.getLong(1) == 6L)
    val mn = df.minFrame.toSpark.collect()(0)
    assert(mn.getLong(0) == 1L && mn.getLong(1) == 2L)
    val rowMax = df.select(Polars.maxHorizontal(col("a"), col("b")).alias("m"))
      .toSpark.collect().map(_.getLong(0)).toSeq
    assert(rowMax == Seq(4L, 5L, 6L))
    val rowMin = df.select(Polars.minHorizontal(col("a"), col("b")).alias("m"))
      .toSpark.collect().map(_.getLong(0)).toSeq
    assert(rowMin == Seq(1L, 2L, 3L))
  }

  test("test_std / test_var: ddof default 1 and ddof 0") {
    val df = DataFrame(Seq(1L, 2L, 3L).toDF("a"))
    assert(df.stdFrame().toSpark.collect()(0).getDouble(0) == 1.0)
    assert(math.abs(df.stdFrame(0).toSpark.collect()(0).getDouble(0) - 0.816497) < 1e-6)
    assert(df.varFrame().toSpark.collect()(0).getDouble(0) == 1.0)
    assert(math.abs(df.varFrame(0).toSpark.collect()(0).getDouble(0) - 0.666667) < 1e-6)
  }

  test("test_median: non-numeric columns stay typed nulls") {
    val df = DataFrame(Seq((1L, "one"), (2L, "two"), (5L, "three")).toDF("a", "b"))
    val med = df.medianFrame.toSpark
    assert(med.schema("b").dataType == StringType)
    val row = med.collect()(0)
    assert(row.getDouble(0) == 2.0 && row.isNullAt(1))
  }

  test("test_drop_in_place splits off the named series") {
    val df = DataFrame(Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("a", "b"))
    val (s, rest) = df.dropInPlace("a")
    assert(s.toList == List(1L, 2L, 3L))
    assert(rest.toSpark.columns.toSeq == Seq("b"))
  }

  test("test_count: count skips nulls, len counts them") {
    val df = DataFrame(Seq(Some(1L), Some(2L), None)
      .map(_.map(Long.box).orNull).toDF("a"))
    assert(df.select(col("a").count).toSpark.collect()(0).getLong(0) == 2L)
    assert(df.select(col("a").len).toSpark.collect()(0).getLong(0) == 3L)
  }

  test("test_replace: unmatched keep their value and dtype; column-valued default") {
    val df = DataFrame(Seq((1L, 1.5), (2L, 2.5), (2L, 5.0), (3L, 1.0)).toDF("a", "b"))
    val kept = df.select(col("a").replaceValues(Map(2L -> 100L)))
      .toSpark.collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L, 100L, 100L, 3L))
    val defaulted = df.select(
      col("a").replaceStrict(Map(2L -> 100.0), Some(col("b"))).alias("a"))
      .toSpark.collect().map(_.getDouble(0)).toSeq
    assert(defaulted == Seq(1.5, 100.0, 100.0, 1.0))
  }

  test("test_comp_scalar style elementwise frame comparison") {
    val df = DataFrame(Seq(1L, 2L, 3L).toDF("a"))
    val got = df.select((col("a") gt Polars.lit(2)).alias("a"))
      .toSpark.collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(false, false, true))
  }
}
