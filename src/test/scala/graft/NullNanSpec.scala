package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** NaN-vs-null edge semantics (SURVEY §7 hard parts): Polars treats NaN as a
  * float *value* and null as *missing*; Spark does the same (NaN == NaN in
  * grouping/set ops, NaN sorts greater than any value, null handled by
  * null-ordering). These tests pin the behaviors our surface relies on.
  */
class NullNanSpec extends SparkSpec {
  import spark.implicits._

  private val nan = Double.NaN
  private def df = DataFrame(
    Seq[(Int, java.lang.Double)]((1, 1.0), (2, nan), (3, null), (4, nan), (5, 2.0))
      .toDF("i", "v"))

  test("is_nan vs is_null are disjoint masks") {
    val out = df.select(
      col("v").isNan.alias("nan"),
      col("v").isNull.alias("nul")).toSpark.collect()
    val nans = out.map(r => if (r.isNullAt(0)) false else r.getBoolean(0)).count(identity)
    val nulls = out.map(_.getBoolean(1)).count(identity)
    assert(nans == 2 && nulls == 1)
  }

  test("fill_nan leaves nulls; fill_null leaves NaNs") {
    val fnan = df.select(col("v").fillNan(0.0).alias("v")).toSpark.collect()
      .map(r => Option(r.get(0)))
    assert(fnan.count(_.isEmpty) == 1)
    assert(!fnan.flatten.exists(v => v.asInstanceOf[Double].isNaN))
    val fnull = df.select(col("v").fillNull(-1.0).alias("v")).toSpark.collect()
      .map(_.getDouble(0))
    assert(fnull.count(_.isNaN) == 2)
    assert(fnull.count(_ == -1.0) == 1)
  }

  test("NaN groups as a single key (NaN == NaN in grouping)") {
    val g = df.groupBy("v").count().toSpark.collect()
    val nanRow = g.find(r => !r.isNullAt(0) && r.getDouble(0).isNaN)
    assert(nanRow.exists(_.getLong(1) == 2))
    val nullRow = g.find(_.isNullAt(0))
    assert(nullRow.exists(_.getLong(1) == 1))
  }

  test("sort order: values < NaN; null placement controlled separately") {
    val sorted = df.sortBy(Seq(col("v")), nullsLast = true).toSpark.collect()
      .map(r => Option(r.get(1)))
    // ascending nulls last: 1.0, 2.0, NaN, NaN, null
    assert(sorted.last.isEmpty)
    val vals = sorted.flatten.map(_.asInstanceOf[Double])
    assert(vals.take(2).toSeq == Seq(1.0, 2.0) && vals.drop(2).forall(_.isNaN))
  }

  test("drop_nulls keeps NaNs; drop_nans keeps nulls") {
    assert(df.dropNulls(Seq("v")).toSpark.count() == 4)
    assert(df.dropNans(Seq("v")).toSpark.count() == 3) // 1.0, 2.0, null survive
  }

  test("null-safe equality eq_missing") {
    val d = DataFrame(Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (null, null), (null, 2.0)).toDF("a", "b"))
    val out = d.select(col("a").eqMissing(col("b")).alias("e")).toSpark
      .collect().map(_.getBoolean(0))
    assert(out.toSeq == Seq(true, true, false))
  }
}
