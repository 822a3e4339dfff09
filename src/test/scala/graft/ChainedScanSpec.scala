package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{Row, functions => F}
import org.apache.spark.sql.types._

/** Chained scan-kernel pins mined from the round-15 fuzz incident (seeds
  * 63/91): stacked diff/cum_sum/diff-of-diff over multi-partition i64
  * frames with nulls and ±inf neighbors. (The fuzz CCE itself was a model
  * bug — Scala's if/else weak-lub widened an i64 diff to f64 — but the
  * engine-side shapes are worth pinning: each op's scan prep re-reads the
  * previous op's helper-laden plan.) */
class ChainedScanSpec extends SparkSpec {

  private def frame(): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("i", LongType),
      StructField("f", DoubleType)))
    val rows = Seq(
      Row(0L, 2L, 0.0), Row(1L, -1L, -1.0), Row(2L, null, 3.25),
      Row(3L, 1L, 3.25), Row(4L, 0L, null))
    DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 3), schema))
  }

  test("diff then cum_sum on i64 (seed 63 shape)") {
    val out = frame()
      .withColumn("w1", col("id").diff())
      .withColumn("w3", col("w1").cumSum())
      .head(6).toSpark
    val got = out.collect().map(r => (r.isNullAt(3), if (r.isNullAt(4)) null else r.get(4)))
    assert(got.length == 5)
    // diff of 0..4 = [null,1,1,1,1]; cum_sum = [null,1,2,3,4]
    assert(got.toSeq.map(_._2) == Seq(null, 1L, 2L, 3L, 4L))
  }

  test("seed 63 exact: 6-col frame, diff -> *(-1) -> cum_sum -> head") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType)))
    val rows = Seq(
      Row(0L, null, 2L, 0.0, "Foo", null),
      Row(1L, "a", -1L, -1.0, "foo", null),
      Row(2L, "c", null, 3.25, "Foo", true),
      Row(3L, null, 1L, 3.25, null, true),
      Row(4L, "a", 0L, null, "ZZ", false))
    val df = DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 3), schema))
    val out = df
      .withColumn("w1", col("id").diff())
      .withColumn("w2", col("w1") * graft.expr.Expr.lit(-1L))
      .withColumn("w3", col("w1").cumSum())
      .head(6).toSpark
    val got = out.collect()
    assert(got.length == 5)
    assert(got.map(r => if (r.isNullAt(8)) null else r.get(8)).toSeq ==
      Seq(null, 1L, 2L, 3L, 4L))
  }

  test("seed 91 exact: diff x3 on 19-row frame with null/inf floats") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("k", StringType),
      StructField("i", LongType), StructField("f", DoubleType),
      StructField("s", StringType), StructField("b", BooleanType)))
    val inf = Double.PositiveInfinity
    val rows = Seq(
      Row(0L, "a", null, -inf, "ZZ", false), Row(1L, "c", -1L, -0.0, "Foo", true),
      Row(2L, "b", -1L, inf, "Foo", false), Row(3L, "a", -1L, -0.0, "Foo", null),
      Row(4L, null, 7L, -2.5, "", false), Row(5L, "c", 7L, null, null, false),
      Row(6L, "b", -1L, null, "ab", true), Row(7L, "a", 100L, -inf, null, true),
      Row(8L, "a", 5L, 1.5, "foo", false), Row(9L, "c", null, 0.5, "ab", false),
      Row(10L, "a", -3L, null, null, true), Row(11L, "b", 100L, -2.5, "a", true),
      Row(12L, "a", 0L, 0.5, "x y", true), Row(13L, "b", 2L, 3.25, "b", false),
      Row(14L, "c", 5L, -1.0, "ab", true), Row(15L, "a", 7L, 0.0, "Foo", false),
      Row(16L, "b", -1L, 1.5, "a", true), Row(17L, "c", 0L, -0.0, "ZZ", false),
      Row(18L, "a", 1L, 0.5, "foo", true))
    val df = DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, numSlices = 3), schema))
    val out = df
      .withColumn("w1", col("id").diff())
      .withColumn("w2", col("w1").diff())
      .withColumn("w3", col("i").diff())
      .tail(4).toSpark
    val got = out.collect()
    assert(got.length == 4)
  }

  test("diff of diff of i64 (seed 91 shape)") {
    val out = frame()
      .withColumn("w1", col("id").diff())
      .withColumn("w2", col("w1").diff())
      .withColumn("w3", col("i").diff())
      .tail(4).toSpark
    val got = out.collect()
    assert(got.length == 4)
  }
}

