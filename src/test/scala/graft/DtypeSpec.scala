package graft

import graft.Polars._
import graft.api.DataFrame
import graft.expr.EnumShim
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Row, functions => F}

/** SURVEY §1.2 dtype-mapping matrix + empty-frame robustness. */
class DtypeSpec extends SparkSpec {
  import spark.implicits._

  test("mixed dtype frame survives select/filter/sort/unique with schema intact") {
    val schema = StructType(Seq(
      StructField("i8", ByteType), StructField("i16", ShortType),
      StructField("i32", IntegerType), StructField("i64", LongType),
      StructField("f32", FloatType), StructField("f64", DoubleType),
      StructField("dec", DecimalType(10, 2)), StructField("b", BooleanType),
      StructField("s", StringType), StructField("bin", BinaryType),
      StructField("d", DateType), StructField("lst", ArrayType(IntegerType)),
      StructField("st", StructType(Seq(StructField("x", IntegerType))))))
    val rows = Seq(
      Row(1.toByte, 2.toShort, 3, 4L, 1.5f, 2.5, BigDecimal("12.34").bigDecimal,
        true, "a", Array[Byte](1, 2), java.sql.Date.valueOf("2024-01-01"),
        Seq(1, 2), Row(9)),
      Row(5.toByte, 6.toShort, 7, 8L, 3.5f, 4.5, BigDecimal("56.78").bigDecimal,
        false, "b", Array[Byte](3), java.sql.Date.valueOf("2024-06-01"),
        Seq(3), Row(10)))
    val df = DataFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema))
    val out = df.filter(col("i32") > 0).sortBy(Seq(col("s"))).unique()
    assert(out.schema == schema)
    assert(out.toSpark.count() == 2)
    // struct + list + decimal survive projection arithmetic
    val proj = df.select(
      col("st").struct.field("x").alias("x"),
      col("lst").list.len.alias("n"),
      (col("dec") * 2).alias("dec2")).toSpark.collect()
    assert(proj.map(_.getInt(0)).sorted.toSeq == Seq(9, 10))
    assert(proj(0).getDecimal(2) != null)
  }

  test("uint widening contract: u32-ish counts come back as LongType") {
    val df = DataFrame(Seq("a", "a", "b").toDF("k"))
    val counts = df.groupBy("k").count().toSpark
    assert(counts.schema("count").dataType == LongType)
  }

  test("enum shim validates categories") {
    val df = DataFrame(Seq("red", "green").toDF("c"))
    val ok = df.select(EnumShim.asEnum(col("c"), Seq("red", "green", "blue")).alias("e"))
      .toSpark.collect().map(_.getString(0))
    assert(ok.toSeq == Seq("red", "green"))
    val bad = DataFrame(Seq("purple").toDF("c"))
    intercept[Exception] {
      bad.select(EnumShim.asEnum(col("c"), Seq("red")).alias("e")).toSpark.collect()
    }
    val lax = bad.select(EnumShim.asEnum(col("c"), Seq("red"), strict = false).alias("e"))
      .toSpark.collect()
    assert(lax(0).isNullAt(0))
  }

  test("dt.time gives nanos since midnight") {
    val df = DataFrame(Seq("2024-03-01 01:02:03").toDF("s"))
      .select(col("s").str.toDatetime().alias("ts"))
    val nanos = df.select(col("ts").dt.time.alias("t")).toSpark.collect()(0).getLong(0)
    assert(nanos == (3600L + 120L + 3L) * 1000000000L)
  }

  test("empty frame: aggregations, windows, joins, sorts do not crash") {
    val empty = DataFrame(Seq.empty[(Int, Double)].toDF("k", "v"))
    assert(empty.filter(col("v") > 0).toSpark.count() == 0)
    assert(empty.groupBy("k").agg(col("v").sum.alias("s")).toSpark.count() == 0)
    assert(empty.sortBy(Seq(col("v"))).head(5).toSpark.count() == 0)
    assert(empty.unique().toSpark.count() == 0)
    val agg = empty.select(col("v").sum.alias("s"), col("v").count.alias("n"))
      .toSpark.collect()(0)
    // polars: sum over an empty frame is 0, not null (expr.rb:2713 golden)
    assert(agg.getDouble(0) == 0.0 && agg.getLong(1) == 0)
    val other = DataFrame(Seq((1, "x")).toDF("k", "s"))
    assert(empty.join(other, Seq("k")).toSpark.count() == 0)
    assert(empty.withRowIndex("i").toSpark.count() == 0)
    assert(empty.reverse.toSpark.count() == 0)
  }

  test("single-row frame: shift/cum/rolling behave") {
    val one = DataFrame(Seq(5.0).toDF("v"))
    val out = one.select(
      col("v").shift(1).alias("sh"),
      col("v").cumSum().alias("cs"),
      col("v").rollingMean(3).alias("rm")).toSpark.collect()(0)
    assert(out.isNullAt(0))
    assert(out.getDouble(1) == 5.0)
    // polars default min_periods = window size: a single row can't fill a
    // 3-row window
    assert(out.isNullAt(2))
  }
}
