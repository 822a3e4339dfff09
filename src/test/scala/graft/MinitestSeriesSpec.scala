package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Round-13 port of the reference minitest tranche (test/series_test.rb) —
  * VALUE and dtype assertions on edge inputs the docstring goldens don't
  * cover: empty/all-null aggregates, string std/var, boolean mean, NaN
  * extremes, out-of-range quantile, entropy values, fills and clips. */
class MinitestSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def s(name: String, xs: Seq[Any], tpe: DataType): Series = {
    val rows = xs.map(v => org.apache.spark.sql.Row(v))
    Series(name, spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField(name, tpe)))))
  }
  private def longs(xs: Option[Long]*): Series =
    s("a", xs.map(_.map(Long.box).orNull), LongType)
  private def dbls(xs: Option[Double]*): Series =
    s("a", xs.map(_.map(Double.box).orNull), DoubleType)

  test("test_sum: [1,2,3] is 6; empty sums to 0") {
    assert(longs(Some(1), Some(2), Some(3)).sum == 6L)
    assert(Series("a", Seq.empty[Double].toDF("a")).sum == 0.0)
  }

  test("test_mean: ints and boolean fraction-true") {
    assert(longs(Some(1), Some(2), Some(3)).mean == 2.0)
    val b = Series("a", Seq(true, true, true, false).toDF("a"))
    assert(b.mean == 0.75)
    assert(b.sum == 3L) // bools numericize under sum too
  }

  test("test_product: [1,2,3] is 6 and stays integral") {
    assert(longs(Some(1), Some(2), Some(3)).product == 6L)
  }

  test("test_min/test_max: ints and strings") {
    assert(longs(Some(1), Some(2), Some(3)).min == 1L)
    assert(longs(Some(1), Some(2), Some(3)).max == 3L)
    val str = Series("a", Seq("a", "b", "c").toDF("a"))
    assert(str.min == "a" && str.max == "c")
  }

  test("test_nan_max/test_nan_min propagate NaN") {
    val x = dbls(Some(1.0), Some(Double.NaN), Some(3.0))
    assert(x.nanMax.asInstanceOf[Double].isNaN)
    assert(x.nanMin.asInstanceOf[Double].isNaN)
  }

  test("test_std/test_var: 1 for [1,2,3]; nil for strings") {
    assert(longs(Some(1), Some(2), Some(3)).std == 1.0)
    assert(longs(Some(1), Some(2), Some(3)).variance == 1.0)
    assert(Series("a", Seq("one", "two", "three").toDF("a")).std == null)
    assert(Series("a", Seq("one", "two", "three").toDF("a")).variance == null)
  }

  test("test_median: [1,2,9] is 2") {
    assert(longs(Some(1), Some(2), Some(9)).median == 2.0)
  }

  test("test_quantile: endpoints, middle, and out-of-range error") {
    val x = longs(Some(1), Some(2), Some(3))
    assert(x.quantile(0).asInstanceOf[Double] == 1.0)
    assert(x.quantile(0.5).asInstanceOf[Double] == 2.0)
    assert(x.quantile(1).asInstanceOf[Double] == 3.0)
    val err = intercept[IllegalArgumentException](x.quantile(2))
    assert(err.getMessage.contains("quantile should be between 0.0 and 1.0"))
  }

  test("test_entropy(normalize: true) exact values") {
    assert(math.abs(dbls(Some(0.99), Some(0.005), Some(0.005))
      .entropy(normalize = true).asInstanceOf[Double] - 0.06293300616044681) < 1e-12)
    assert(math.abs(dbls(Some(0.65), Some(0.10), Some(0.25))
      .entropy(normalize = true).asInstanceOf[Double] - 0.8568409950394724) < 1e-12)
  }

  test("test_sqrt / test_log / test_log10 / test_exp") {
    assert(longs(Some(1), Some(4), Some(9)).sqrt.toList == List(1.0, 2.0, 3.0))
    assert(longs(Some(1), Some(2), Some(4)).log(2).toList == List(0.0, 1.0, 2.0))
    assert(longs(Some(1), Some(10), Some(100)).log10.toList == List(0.0, 1.0, 2.0))
    val ex = longs(Some(0), Some(1)).exp.toList.map(_.asInstanceOf[Double])
    assert(ex(0) == 1.0 && math.abs(ex(1) - math.E) < 1e-15)
  }

  test("test_drop_nulls keeps NaN; test_drop_nans keeps null") {
    val x = dbls(None, Some(1.0), Some(Double.NaN))
    assert(x.dropNulls.toList.map(_.asInstanceOf[Double].isNaN) == List(false, true))
    assert(x.dropNans.toList == List(null, 1.0))
  }

  test("test_comp_series and test_comp_scalar") {
    val a = Series("a", Seq(1L, 2L, 3L, 4L).toDF("a"))
    val b = Series("b", Seq(0L, 2L, 3L, 5L).toDF("b"))
    assert(a.eqSeries(b).toList == List(false, true, true, false))
    assert(a.neSeries(b).toList == List(true, false, false, true))
    val c = longs(Some(1), Some(2), Some(3))
    assert(c.eqScalar(2).toList == List(false, true, false))
    assert(c.gtScalar(2).toList == List(false, false, true))
    assert(c.leScalar(2).toList == List(true, true, false))
  }

  test("test_equals_nan: s == s is all-true under value equality") {
    val x = dbls(Some(1.0), Some(Double.NaN), Some(Double.PositiveInfinity))
    assert(x.eqSeries(x).toList == List(true, true, true))
  }

  test("test_arithmetic: series-series and the integer division dtype") {
    val a = Series("a", Seq(10L, 20L, 30L).toDF("a"))
    val b = Series("b", Seq(5L, 10L, 15L).toDF("b"))
    assert((a + b).toList == List(15L, 30L, 45L))
    assert((a - b).toList == List(5L, 10L, 15L))
    assert((a * b).toList == List(50L, 200L, 450L))
  }

  test("test_null_count / test_has_validity / test_is_empty") {
    assert(longs(Some(1), None, None, Some(4), None).nullCount == 3L)
    assert(!longs(Some(1), Some(2)).hasValidity)
    assert(longs(Some(1), None).hasValidity)
    assert(Series("a", Seq.empty[Long].toDF("a")).isEmpty)
    assert(!longs(Some(1)).isEmpty)
  }

  test("test_series_equal / test_len / test_to_a") {
    val a = longs(Some(1), Some(2))
    assert(a.seriesEquals(longs(Some(1), Some(2))))
    assert(Series("a", (1L to 10L).toDF("a")).len == 10L)
    assert(longs(Some(1), Some(2), Some(3)).toList == List(1L, 2L, 3L))
  }

  test("test_fill_nan / fill_null(strategy: forward)") {
    val x = dbls(Some(1.0), Some(2.0), Some(3.0), Some(Double.NaN))
    assert(x.fillNan(0).toList == List(1.0, 2.0, 3.0, 0.0))
    val y = longs(Some(1), Some(2), Some(3), None)
    assert(y.forwardFill.toList == List(1L, 2L, 3L, 3L))
  }

  test("test_floor / test_ceil / test_round") {
    val x = dbls(Some(1.12345), Some(2.56789), Some(3.901234))
    assert(x.floor.toList == List(1.0, 2.0, 3.0))
    assert(x.ceil.toList == List(2.0, 3.0, 4.0))
    assert(x.round(2).toList == List(1.12, 2.57, 3.9))
    assert(x.round().toList == List(1.0, 3.0, 4.0))
  }

  test("test_peak_max / test_peak_min") {
    assert(longs(Some(1), Some(2), Some(3), Some(4), Some(5)).peakMax.toList ==
      List(false, false, false, false, true))
    assert(longs(Some(4), Some(1), Some(3), Some(2), Some(5)).peakMin.toList ==
      List(false, true, false, true, false))
  }

  test("test_n_unique / test_unique") {
    val x = longs(Some(1), Some(1), Some(2), Some(2), Some(5))
    assert(x.nUnique == 3L)
    assert(x.unique.sort().toList == List(1L, 2L, 5L))
  }

  test("test_interpolate: [1,2,nil,nil,5] fills 3,4") {
    assert(longs(Some(1), Some(2), None, None, Some(5)).interpolate()
      .toList == List(1.0, 2.0, 3.0, 4.0, 5.0))
  }

  test("test_skew / test_kurtosis on [1,2,3]") {
    assert(math.abs(longs(Some(1), Some(2), Some(3)).skew().asInstanceOf[Double]) < 1e-12)
    assert(math.abs(longs(Some(1), Some(2), Some(3)).kurtosis()
      .asInstanceOf[Double] - (-1.5)) < 1e-12)
    assert(math.abs(longs(Some(1), Some(2), Some(3)).kurtosis(fisher = false)
      .asInstanceOf[Double] - 1.5) < 1e-12)
  }

  test("test_clip / test_clip_min / test_clip_max keep nulls") {
    val x = longs(Some(-50), Some(5), None, Some(50))
    assert(x.clip(1, 10).toList == List(1L, 5L, null, 10L))
    assert(x.clipMin(1).toList == List(1L, 5L, null, 50L))
    assert(x.clipMax(10).toList == List(-50L, 5L, null, 10L))
  }

  test("test_extend_constant with a value and with nil") {
    assert(longs(Some(1), Some(2), Some(3)).extendConstant(99L, 2).toList ==
      List(1L, 2L, 3L, 99L, 99L))
    assert(longs(Some(1), Some(2), Some(3)).extendConstant(null, 2).toList ==
      List(1L, 2L, 3L, null, null))
  }

  test("test_new_from_index: broadcast the value at an index") {
    assert(longs(Some(1), Some(2), Some(3)).newFromIndex(1, 5).toList ==
      List(2L, 2L, 2L, 2L, 2L))
  }

  test("test_shrink_dtype: [1,2,3] shrinks to i8") {
    val out = longs(Some(1), Some(2), Some(3)).shrinkDtype
    assert(out.dtype == ByteType)
    assert(out.toList == List(1.toByte, 2.toByte, 3.toByte))
  }

  test("test_search_sorted: [1,2,4].search_sorted(3) is 2") {
    assert(longs(Some(1), Some(2), Some(4)).searchSorted(3L) == 2L)
  }

  test("test_take / test_filter / test_head / test_tail / test_slice / test_limit") {
    val x = Series("a", Seq(1L, 2L, 3L, 4L).toDF("a"))
    assert(x.take(Seq(1L, 3L)).toList == List(2L, 4L))
    assert(x.slice(1, 2).toList == List(2L, 3L))
    assert(x.slice(2).toList == List(3L, 4L))
    val s20 = Series("a", (1L to 20L).toDF("a"))
    assert(s20.head().toList == (1L to 10L).toList)
    assert(s20.head(3).toList == List(1L, 2L, 3L))
    assert(s20.tail(3).toList == List(18L, 19L, 20L))
    assert(s20.limit(2).toList == List(1L, 2L))
    val mask = Series("m", Seq(true, false, true, false).toDF("m"))
    assert(x.filter(mask).toList == List(1L, 3L))
  }

  test("test_sort / test_reverse / test_append") {
    val x = Series("a", Seq(2L, 3L, 1L).toDF("a"))
    assert(x.sort().toList == List(1L, 2L, 3L))
    assert(x.sort(descending = true).toList == List(3L, 2L, 1L))
    assert(longs(Some(1), Some(2), Some(3)).reverse.toList == List(3L, 2L, 1L))
    assert(longs(Some(1), Some(2)).append(longs(Some(3), Some(4))).toList ==
      List(1L, 2L, 3L, 4L))
  }

  test("test_any / test_all / test_none incl. Kleene ignore_nulls: false") {
    assert(Series("a", Seq(false, false, true).toDF("a")).any() == true)
    assert(Series("a", Seq(false, false, false).toDF("a")).any() == false)
    assert(Series("a", Seq(true, true, true).toDF("a")).all() == true)
    assert(Series("a", Seq(true, true, false).toDF("a")).all() == false)
    val withNull = s("a", Seq(true, null), BooleanType)
    assert(withNull.all() == true)
    assert(withNull.all(ignoreNulls = false) == null) // Kleene: unknown
    assert(Series("a", Seq(false, false).toDF("a")).none == true)
  }

  test("test_to_dummies shape") {
    val d = Series("a", Seq("a", "b", "b").toDF("a")).toDummies()
    assert(d.toSpark.count() == 3 && d.toSpark.columns.length == 2)
  }

  test("test_value_counts values (row order free)") {
    val vc = Series("a", Seq("x", "x", "y").toDF("a")).valueCounts()
      .sortBy(Seq(col("a"))).toSpark.collect()
    assert(vc.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("x", 2L), ("y", 1L)))
  }

  test("eq vs eq_missing: null == null (series.rb:305)") {
    val s1 = longs(Some(333), Some(200), None)
    val s2 = longs(Some(100), Some(200), None)
    assert(s1.eqSeries(s2).toList == List(false, true, null))
    assert(s1.eqMissing(s2).toList == List(false, true, true))
    assert(s1.neMissing(s2).toList == List(true, false, false))
  }

  test("zip_with: mask picks self, else other (series.rb golden)") {
    val s1 = longs(Some(1), Some(2), Some(3), Some(4), Some(5))
    val s2 = longs(Some(5), Some(4), Some(3), Some(2), Some(1))
    assert(s1.zipWith(s1.ltSeries(s2), s2).toList == List(1L, 2L, 3L, 2L, 1L))
    val mask = Series("m", Seq(true, false, true, false, true).toDF("m"))
    assert(s1.zipWith(mask, s2).toList == List(1L, 4L, 3L, 2L, 5L))
  }

  test("test_dot / test_set_sorted / test_cleared / arg_true") {
    val a = longs(Some(1), Some(2), Some(3))
    val b = dbls(Some(4.0), Some(5.0), Some(6.0))
    assert(a.dot(b) == 32.0)
    assert(a.setSorted().max == 3L)
    val c = Series("a", Seq[Option[Boolean]](None, Some(true), Some(false))
      .map(_.map(Boolean.box).orNull).toDF("a")).cleared
    assert(c.len == 0L && c.dtype == BooleanType)
    assert(a.eqScalar(2L).argTrue.toList == List(1L))
  }

  test("is_in against another series (broadcast membership)") {
    val s = Series("a", Seq(1L, 2L, 3L).toDF("a"))
    val s2 = Series("b", Seq(2L, 4L).toDF("b"))
    assert(s2.isIn(s).toList == List(true, false))
  }

  test("series.rb replace: values, sequences, and dtype preservation") {
    val s = longs(Some(1), Some(2), Some(2), Some(3))
    assert(s.replace(2L, 100L).toList == List(1L, 100L, 100L, 3L))
    assert(s.replace(Seq(2L, 3L), Seq(100L, 200L)).toList == List(1L, 100L, 100L, 200L))
    assert(s.replace(Map[Any, Any](2L -> 100L, 3L -> 200L)).toList ==
      List(1L, 100L, 100L, 200L))
    // replacing str by ints keeps str: {"x"=>1} over str yields "1"
    val t = Series("a", Seq("x", "y", "z").toDF("a"))
    val replaced = t.replace(Map[Any, Any]("x" -> 1, "y" -> 2, "z" -> 3))
    assert(replaced.dtype == StringType)
    assert(replaced.toList == List("1", "2", "3"))
  }

  test("test_is_numeric / is_float / is_bool / is_utf8 / is_datelike") {
    assert(longs(Some(1)).isNumeric && dbls(Some(1.0)).isNumeric)
    assert(!Series("a", Seq("one").toDF("a")).isNumeric)
    assert(dbls(Some(1.5)).isFloat && !longs(Some(1)).isFloat)
    assert(Series("a", Seq(true).toDF("a")).isBoolean)
    assert(Series("a", Seq("one").toDF("a")).isUtf8)
    assert(Series("a", Seq(java.sql.Date.valueOf("2024-01-01")).toDF("a")).isDatelike)
    assert(!longs(Some(1)).isDatelike)
  }
}
