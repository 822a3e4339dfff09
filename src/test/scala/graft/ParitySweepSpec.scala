package graft

import graft.Polars
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Reference-surface parity sweep (round 4): deprecated aliases and named
  * spellings from series.rb / expr.rb / data_frame.rb / the namespace files,
  * pinned so a reference user's call sites resolve here too. */
class ParitySweepSpec extends SparkSpec {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private def one(e: Expr): Any =
    Seq(1).toDF("x").select(e.col.as("r")).collect()(0).get(0)

  test("named operator spellings match symbolic forms") {
    val df = Seq((7.0, 2.0)).toDF("a", "b")
    val r = df.select(
      Polars.col("a").add(Polars.col("b")).alias("add").col,
      Polars.col("a").sub(Polars.col("b")).alias("sub").col,
      Polars.col("a").mul(Polars.col("b")).alias("mul").col,
      Polars.col("a").truediv(Polars.col("b")).alias("div").col,
      Polars.col("a").mod(Polars.col("b")).alias("mod").col,
      Polars.col("a").neg.alias("neg").col,
      Polars.col("a").gt(Polars.col("b")).alias("gt").col,
      Polars.col("a").le(Polars.col("b")).alias("le").col,
      Polars.col("a").eq(Polars.col("b")).alias("eq").col,
      Polars.col("a").ne(Polars.col("b")).alias("ne").col).collect()(0)
    assert(r.getDouble(0) == 9.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 14.0)
    assert(r.getDouble(3) == 3.5 && r.getDouble(4) == 1.0 && r.getDouble(5) == -7.0)
    assert(r.getBoolean(6) && !r.getBoolean(7) && !r.getBoolean(8) && r.getBoolean(9))
  }

  test("arc-trig aliases delegate to the asin family") {
    val v = Seq(0.5).toDF("x").select(
      Polars.col("x").arcsin.alias("s").col,
      Polars.col("x").arccos.alias("c").col,
      Polars.col("x").arctanh.alias("th").col).collect()(0)
    assert(math.abs(v.getDouble(0) - math.asin(0.5)) < 1e-12)
    assert(math.abs(v.getDouble(1) - math.acos(0.5)) < 1e-12)
    assert(math.abs(v.getDouble(2) - 0.5 * math.log(3.0)) < 1e-12)
  }

  test("prefix/suffix/mapAlias rename via meta output name") {
    val df = Seq(1).toDF("x")
    val out = df.select(
      Polars.col("x").prefix("p_").col,
      Polars.col("x").suffix("_s").col,
      Polars.col("x").alias("y").mapAlias(_.toUpperCase).col)
    assert(out.columns.toSeq == Seq("p_x", "x_s", "Y"))
  }

  test("expr flatten explodes list columns") {
    val df = Seq(Seq(1, 2), Seq(3)).toDF("xs")
    val out = df.select(Polars.col("xs").flatten.alias("x").col)
      .collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 2, 3))
  }

  test("str deprecated aliases: lstrip/rstrip/ljust/rjust/nChars/countMatch/parseInt") {
    val r = Seq("  ab  ").toDF("t").select(
      Polars.col("t").str.lstrip.alias("l").col,
      Polars.col("t").str.rstrip.alias("r").col,
      Polars.col("t").str.stripChars.str.ljust(4, ".").alias("lj").col,
      Polars.col("t").str.stripChars.str.rjust(4, ".").alias("rj").col,
      Polars.col("t").str.nChars.alias("n").col,
      Polars.col("t").str.countMatch("a").alias("cm").col).collect()(0)
    assert(r.getString(0) == "ab  " && r.getString(1) == "  ab")
    assert(r.getString(2) == "ab.." && r.getString(3) == "..ab")
    assert(r.getLong(4) == 6L && r.getInt(5) == 1) // len_chars u32 → i64 (§1.2)
    val p = Seq("110").toDF("t")
      .select(Polars.col("t").str.parseInt().alias("v").col).collect()(0)
    assert(p.getLong(0) == 6L)
  }

  test("dt withTimeUnit reinterprets duration ticks; datetime is the ts view") {
    // 5 µs-ticks reinterpreted as ms-ticks = 5000 µs
    val r = Seq(5L).toDF("d").select(
      Polars.col("d").dt.withTimeUnit("ms").alias("ms").col,
      Polars.col("d").dt.withTimeUnit("us").alias("us").col,
      Polars.col("d").dt.withTimeUnit("ns").alias("ns").col).collect()(0)
    assert(r.getLong(0) == 5000L && r.getLong(1) == 5L && r.getLong(2) == 0L)
    val ts = Seq("2024-01-02 03:04:05").toDF("t")
      .select(Polars.col("t").cast(TimestampType).dt.datetime.alias("x").col)
    assert(ts.schema.head.dataType == TimestampType)
  }

  test("cat isLocal/toLocal and struct fields") {
    assert(Polars.col("x").cat.isLocal)
    val df = Seq((1, "a")).toDF("i", "s")
      .select(F.struct(F.col("i"), F.col("s")).as("st"))
    val names = df.select(Expr(F.col("st")).struct.fields.alias("f").col)
      .collect()(0).getSeq[String](0)
    assert(names == Seq("i", "s"))
  }

  test("series append/takeEvery/newFromIndex/hasValidity/innerDtype/timeUnit") {
    val a = Series("v", Seq(1, 2, 3))
    val b = Series("w", Seq(4, 5))
    assert(a.append(b).toList == List(1, 2, 3, 4, 5))
    assert(a.append(b).name == "v")
    assert(Series("v", Seq(1, 2, 3, 4, 5, 6)).takeEvery(2, 1).toList == List(2, 4, 6))
    assert(a.newFromIndex(1, 3).toList == List(2, 2, 2))
    assert(!a.hasValidity)
    assert(Series("n", Seq[Any](1, null)).hasValidity)
    assert(a.innerDtype.isEmpty)
    assert(a.timeUnit == "us")
  }

  test("series named comparisons and equality") {
    val a = Series("v", Seq(1, 2, 3))
    val b = Series("w", Seq(3, 2, 1))
    assert(a.eq(b).toList == List(false, true, false))
    assert(a.lt(b).toList == List(true, false, false))
    assert(a.ge(b).toList == List(false, true, true))
    assert(a.seriesEquals(Series("x", Seq(1, 2, 3))))
    assert(!a.seriesEquals(b))
    assert(!a.seriesEquals(Series("x", Seq(1, 2))))
  }

  test("series scatter/set and uniqueness masks") {
    val a = Series("v", Seq(10, 20, 30, 20))
    assert(a.scatter(Seq(0L, 2L), Seq(99, 77)).toList == List(99, 20, 77, 20))
    val mask = Series("m", Seq(true, false, true, false))
    assert(a.set(mask, 0).toList == List(0, 20, 0, 20))
    assert(a.isUnique.toList == List(true, false, true, false))
    assert(a.isDuplicated.toList == List(false, true, false, true))
    assert(a.isFirstDistinct.toList == List(true, true, true, false))
  }

  test("frame contains/getColumnIndex/clear/dropInPlace/delete") {
    val df = DataFrame(Seq((1, "a"), (2, "b")).toDF("i", "s"))
    assert(df.contains("s") && !df.contains("z"))
    assert(df.getColumnIndex("s") == 1)
    intercept[IllegalArgumentException](df.getColumnIndex("z"))
    assert(df.clear().height == 0 && df.clear().columns == Seq("i", "s"))
    val (col, rest) = df.dropInPlace("s")
    assert(col.toList == List("a", "b") && rest.columns == Seq("i"))
    assert(df.delete("z").isEmpty && df.delete("s").get.toList == List("a", "b"))
  }

  test("frameEquals, uniqueness masks, csv string, row iterator") {
    val df = DataFrame(Seq((1, "a"), (2, "b"), (1, "a")).toDF("i", "s"))
    assert(df.frameEquals(DataFrame(Seq((1, "a"), (2, "b"), (1, "a")).toDF("i", "s"))))
    assert(!df.frameEquals(DataFrame(Seq((1, "a"), (2, "x"), (1, "a")).toDF("i", "s"))))
    assert(df.isUniqueRows.toList == List(false, true, false))
    assert(df.isDuplicatedRows.toList == List(true, false, true))
    assert(df.toCsvString() == "i,s\n1,a\n2,b\n1,a\n")
    assert(DataFrame(Seq((1, "a,b")).toDF("i", "s")).toCsvString(includeHeader = false)
      == "1,\"a,b\"\n")
    assert(df.iterRows().size == 3)
    var n = 0; df.eachRow(_ => n += 1); assert(n == 3)
  }

  test("frame joinAsof delegates to the kernel") {
    val quotes = DataFrame(Seq((1L, 10.0), (5L, 50.0)).toDF("t", "px"))
    val trades = DataFrame(Seq((2L, "x"), (6L, "y")).toDF("t", "tag"))
    val out = trades.joinAsof(quotes, on = "t").toSpark
      .orderBy("t").collect().map(r => r.getAs[Double]("px")).toSeq
    assert(out == Seq(10.0, 50.0))
    assert(DataFrame(Seq((1, 2)).toDF("a", "b")).takeEvery(1).height == 1)
  }

  test("Polars module shims: groups/variance/fromHash/seed/stringCache") {
    val df = DataFrame(Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v"))
    val g = df.groupBy("k").agg(Polars.groups("v").alias("g"),
        Polars.variance(Polars.col("v")).alias("var"))
      .toSpark.orderBy("k").collect()
    assert(g(0).getAs[Double]("var") == 2.0)
    assert(g(0).getSeq[Long](g(0).fieldIndex("g")).toList == List(0L, 1L)) // row indices of group a
    val fh = Polars.fromHash(Map("x" -> Seq(1, 2), "y" -> Seq("a", "b")))
    assert(fh.height == 2 && fh.columns.toSet == Set("x", "y"))
    Polars.setRandomSeed(7)
    assert(Polars.defaultRandomSeed == 7)
    Polars.setRandomSeed(42)
    assert(Polars.usingStringCache { 1 + 1 } == 2)
    Polars.enableStringCache(); Polars.disableStringCache()
  }

  test("read_csv try_parse_dates: dates stay strings unless requested") {
    val f = java.nio.file.Files.createTempFile("graft-dates", ".csv")
    java.nio.file.Files.writeString(f, "d,v\n2024-01-02,1\n2024-03-04,2\n")
    val asStr = Polars.readCsv(f.toString)
    assert(asStr.schema("d").dataType == StringType) // reference default
    val asDate = Polars.readCsv(f.toString, tryParseDates = true)
    assert(asDate.schema("d").dataType == DateType)
    assert(asDate.toSpark.orderBy("v").collect()(0).getDate(0).toString == "2024-01-02")
    java.nio.file.Files.delete(f)
  }

  test("SQLContext registerMany and Testing not-equal asserts") {
    val ctx = new graft.api.SQLContext(spark)
    ctx.registerMany(Map(
      "ta" -> DataFrame(Seq(1).toDF("x")), "tb" -> DataFrame(Seq(2).toDF("x"))))
    assert(ctx.executeEager("SELECT (SELECT x FROM ta) + (SELECT x FROM tb) AS v")
      .item() == 3)
    ctx.unregisterMany(Seq("ta", "tb"))
    val l = Seq(1).toDF("x"); val r = Seq(2).toDF("x")
    graft.testing.Testing.assertFrameNotEqual(l, r)
    intercept[graft.testing.Testing.FrameMismatch](
      graft.testing.Testing.assertFrameNotEqual(l, l))
    graft.testing.Testing.assertSeriesNotEqual(Series("a", Seq(1)), Series("a", Seq(2)))
  }

  test("Series#map_elements runs an arbitrary closure per element, skipping nulls") {
    // reference test/series_test.rb map_elements: s.map_elements { |x| x * 2 }
    val s = Series("a", Seq[Option[Int]](Some(1), None, Some(3)).toDF("a"))
    val doubled = s.mapElements((x: Int) => x * 2)
    assert(doubled.name == "a")
    assert(doubled.toList == List(2, null, 6))
    // type-changing closure (Int => String), the dispatcher case
    val named = Series("a", Seq(1, 2).toDF("a")).mapElements((x: Int) => s"v$x")
    assert(named.toList == List("v1", "v2"))
    val strict = Series("a", Seq(2, 5).toDF("a")).mapElementsStrict((x: Int) => x + 10)
    assert(strict.toList == List(12, 15))
  }

  test("DataFrame#map_rows applies a row closure under an explicit schema") {
    // reference test/data_frame_test.rb map_rows: df.map_rows { |r| [r[0] * 2, r[1]] }
    val df = DataFrame(Seq((1, "a"), (2, "b")).toDF("x", "s"))
    val out = df.mapRows(StructType(Seq(
      StructField("x2", IntegerType), StructField("s", StringType))))(
      r => org.apache.spark.sql.Row(r.getInt(0) * 2, r.getString(1)))
    assert(out.columns == Seq("x2", "s"))
    assert(out.toSpark.orderBy("x2").collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      == Seq((2, "a"), (4, "b")))
  }
}
