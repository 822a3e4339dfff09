package graft

import graft.Polars._
import graft.api.DataFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

class ExprSpec extends SparkSpec {
  import spark.implicits._

  private def frame = DataFrame(
    Seq((1, 2.0, "a"), (2, 4.0, "b"), (3, 6.0, "b"), (4, 8.0, "c"))
      .toDF("i", "x", "s"))

  test("select with arithmetic and aliases") {
    val out = frame.select(
      (col("i") + 10).alias("i10"),
      (col("x") * col("i")).alias("xi")).toSpark.collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(11, 12, 13, 14))
    assert(out.map(_.getDouble(1)).toSeq == Seq(2.0, 8.0, 18.0, 32.0))
  }

  test("filter with boolean composition") {
    val out = frame.filter(col("i") > 1 && col("s") === "b").toSpark.collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(2, 3))
  }

  test("when/then/otherwise chain") {
    val out = frame.select(
      Polars.when(col("i") < 2).then("lo")
        .when(col("i") < 4).then("mid").otherwise("hi").alias("b")).toSpark
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("lo", "mid", "mid", "hi"))
  }

  test("aggregations in group context") {
    val out = frame.groupBy("s").agg(
      col("x").sum.alias("sx"),
      col("i").mean.alias("mi"),
      Expr(F.count(F.lit(1))).alias("n"))
      .sortBy(Seq(col("s"))).toSpark.collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1), r.getLong(3))).toSeq ==
      Seq(("a", 2.0, 1L), ("b", 10.0, 2L), ("c", 8.0, 1L)))
  }

  test("quantile interpolation modes") {
    val df = DataFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    def q(mode: String): Double =
      df.select(col("v").quantile(0.5, mode).alias("q")).toSpark.collect()(0).getDouble(0)
    assert(q("linear") == 2.5)
    assert(q("lower") == 2.0)
    assert(q("higher") == 3.0)
    assert(q("midpoint") == 2.5)
    // h = 0.5*3 = 1.5: polars rounds half AWAY from zero (expr.rb:2473
    // golden pins the same at q=0.3 over 6 rows) -> hi
    assert(q("nearest") == 3.0)
  }

  test("std/var with non-default ddof") {
    val df = DataFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val out = df.select(
      col("v").variance(0).alias("v0"),
      col("v").variance(1).alias("v1")).toSpark.collect()(0)
    assert(math.abs(out.getDouble(0) - 1.25) < 1e-12)
    assert(math.abs(out.getDouble(1) - 5.0 / 3) < 1e-12)
  }

  test("shift/diff/cum_sum use implicit row order") {
    val df = DataFrame(Seq(10, 20, 40, 80).toDF("v"))
    val out = df.select(
      col("v").shift(1).alias("sh"),
      col("v").diff(1).alias("df"),
      col("v").cumSum().alias("cs")).toSpark.collect()
    assert(out.map(r => Option(r.get(0))).toSeq == Seq(None, Some(10), Some(20), Some(40)))
    assert(out.map(r => Option(r.get(1))).toSeq == Seq(None, Some(10), Some(20), Some(40)))
    assert(out.map(_.getLong(2)).toSeq == Seq(10L, 30L, 70L, 150L))
  }

  test("rolling with min_periods") {
    val df = DataFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val out = df.select(col("v").rollingMean(3, minPeriods = 2).alias("rm"))
      .toSpark.collect().map(r => Option(r.get(0)))
    assert(out.toSeq == Seq(None, Some(1.5), Some(2.0), Some(3.0)))
  }

  test("nan extrema, cot, replace_strict, sort_by agg") {
    val df = DataFrame(Seq(("a", 1.0), ("a", Double.NaN), ("b", 2.0), ("b", 5.0))
      .toDF("k", "v"))
    val agg = df.groupBy("k").agg(
      col("v").nanMax.alias("nmx"), col("v").nanMin.alias("nmn")).sortBy(Seq(col("k")))
      .toSpark.collect()
    assert(agg(0).getDouble(1).isNaN && agg(0).getDouble(2).isNaN) // a: NaN poisons both
    assert(agg(1).getDouble(1) == 5.0 && agg(1).getDouble(2) == 2.0)
    val c = DataFrame(Seq(1.0).toDF("x"))
      .select(col("x").cot.alias("c")).toSpark.collect()(0).getDouble(0)
    assert(math.abs(c - 1.0 / math.tan(1.0)) < 1e-12)
    val rs = DataFrame(Seq("x", "y").toDF("s"))
      .select(col("s").replaceStrict(Map("x" -> 1, "y" -> 2)).alias("r"))
      .toSpark.collect().map(_.getInt(0)).toSeq
    assert(rs == Seq(1, 2))
    val err = intercept[Exception] {
      DataFrame(Seq("x", "z").toDF("s"))
        .select(col("s").replaceStrict(Map("x" -> 1)).alias("r")).toSpark.collect()
    }
    assert(err.getMessage.contains("not mapped"))
    val dflt = DataFrame(Seq("x", "z").toDF("s"))
      .select(col("s").replaceStrict(Map("x" -> 1), default = Some(0)).alias("r"))
      .toSpark.collect().map(_.getInt(0)).toSeq
    assert(dflt == Seq(1, 0))
    // sort_by in agg: values of v ordered by key w
    val sb = DataFrame(Seq((1, 30, "c"), (1, 10, "a"), (1, 20, "b")).toDF("g", "w", "v"))
      .groupBy("g").agg(col("v").sortByAgg(col("w")).alias("sorted"))
      .toSpark.collect()(0).getSeq[String](1)
    assert(sb == Seq("a", "b", "c"))
  }

  test("rolling quantile modes and rolling skew") {
    val df = DataFrame(Seq(3.0, 1.0, 4.0, 1.0, 5.0).toDF("v"))
    // linear median over trailing-3 equals rollingMedian
    val med = df.select(
      col("v").rollingQuantile(0.5, 3, "linear").alias("rq"),
      col("v").rollingMedian(3).alias("rm")).toSpark.collect()
    med.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    // default min_periods = window size: the first two rows are null
    assert(med(0).isNullAt(0) && med(1).isNullAt(0) && !med(2).isNullAt(0))
    // lower/higher index the sorted window: last window sorted = [1,4,5]
    val lh = df.select(
      col("v").rollingQuantile(0.5, 3, "lower").alias("lo"),
      col("v").rollingQuantile(0.9, 3, "higher").alias("hi")).toSpark.collect().last
    assert(lh.getDouble(0) == 4.0 && lh.getDouble(1) == 5.0)
    // an all-null window yields null, not an element_at error
    val nulls = DataFrame(Seq[(Integer, Integer)]((1, null), (2, null), (3, 7))
      .toDF("i", "nv"))
    val nq = nulls.select(col("nv").rollingQuantile(0.5, 2, "linear", minPeriods = 1).alias("q"))
      .toSpark.collect()
    assert(nq(0).isNullAt(0) && nq(1).isNullAt(0) && !nq(2).isNullAt(0))
    // skew of the last window [4,1,5]: m2=17/9... compute expected directly
    val xs = Seq(4.0, 1.0, 5.0)
    val mean = xs.sum / 3
    val m2 = xs.map(x => math.pow(x - mean, 2)).sum / 3
    val m3 = xs.map(x => math.pow(x - mean, 3)).sum / 3
    val g1 = m3 / math.pow(m2, 1.5)
    val sk = df.select(
      col("v").rollingSkew(3).alias("b"),
      col("v").rollingSkew(3, bias = false).alias("u")).toSpark.collect().last
    assert(math.abs(sk.getDouble(0) - g1) < 1e-12)
    assert(math.abs(sk.getDouble(1) - g1 * math.sqrt(3.0 * 2.0) / 1.0) < 1e-12)
  }

  test("fill null / forward fill") {
    val df = DataFrame(Seq[(Integer, Integer)]((1, null), (2, 5), (3, null), (4, 7))
      .toDF("i", "v"))
    val filled = df.select(col("v").fillNull(0).alias("f")).toSpark
      .collect().map(_.getInt(0)).toSeq
    assert(filled == Seq(0, 5, 0, 7))
    val ff = df.select(col("v").forwardFill.alias("f")).toSpark
      .collect().map(r => Option(r.get(0))).toSeq
    assert(ff == Seq(None, Some(5), Some(5), Some(7)))
  }

  test("rank methods") {
    val df = DataFrame(Seq(10, 20, 20, 30).toDF("v"))
    def rk(m: String) = df.select(col("v").rank(m).alias("r")).toSpark
      .collect().map(_.get(0)).toSeq
    assert(rk("min") == Seq(1, 2, 2, 4))
    assert(rk("dense") == Seq(1, 2, 2, 3))
    assert(rk("ordinal") == Seq(1, 2, 3, 4))
    assert(rk("average") == Seq(1.0, 2.5, 2.5, 4.0))
  }

  test("str namespace basics") {
    val df = DataFrame(Seq("  Hello World  ", "graft").toDF("t"))
    val out = df.select(
      col("t").str.stripChars.str.toUppercase.alias("u"),
      col("t").str.lenChars.alias("n")).toSpark.collect()
    assert(out(0).getString(0) == "HELLO WORLD")
    assert(out(1).getString(0) == "GRAFT")
  }

  test("str replace first vs all") {
    val df = DataFrame(Seq("aXbXc").toDF("t"))
    val out = df.select(
      col("t").str.replace("X", "-").alias("one"),
      col("t").str.replaceAll("X", "-").alias("all")).toSpark.collect()(0)
    assert(out.getString(0) == "a-bXc")
    assert(out.getString(1) == "a-b-c")
  }

  test("str replace first works across newlines and repeated spaces") {
    val df = DataFrame(Seq("a\nXbXc", "no match", " X X").toDF("t"))
    val out = df.select(col("t").str.replace("X", "-").alias("r")).toSpark.collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a\n-bXc", "no match", " - X"))
  }

  test("product handles zeros and negatives exactly") {
    val df = DataFrame(Seq(2.0, 0.0).toDF("v"))
    assert(df.select(col("v").product.alias("p")).toSpark.collect()(0).getDouble(0) == 0.0)
    val df2 = DataFrame(Seq(2.0, -3.0, 4.0).toDF("v"))
    assert(df2.select(col("v").product.alias("p")).toSpark.collect()(0).getDouble(0) == -24.0)
  }

  test("meta namespace: output_name, root_names, is_column, undo_aliases") {
    val e = (col("a") + col("b")).alias("s")
    assert(e.meta.outputName.contains("s"))
    assert(e.meta.rootNames == Seq("a", "b"))
    assert(!e.meta.isColumn && col("a").meta.isColumn)
    assert(Polars.lit(1).meta.isLiteral)
    assert(e.meta.undoAliases.meta.outputName.contains("a")) // alias stripped -> leftmost leaf
    assert(col("a").meta.treeEq(col("a")) && col("a").meta.treeNe(col("b")))
    assert((col("a") + 1).meta.pop.nonEmpty)
    assert(e.meta.treeFormat.nonEmpty)
  }

  test("cut left_closed flips boundary membership") {
    val df = DataFrame(Seq(1.0, 2.0, 3.0).toDF("v"))
    val right = df.select(col("v").cut(Seq(2.0), Some(Seq("lo", "hi"))).alias("b"))
      .toSpark.collect().map(_.getString(0))
    val left = df.select(col("v").cut(Seq(2.0), Some(Seq("lo", "hi")), leftClosed = true).alias("b"))
      .toSpark.collect().map(_.getString(0))
    assert(right.toSeq == Seq("lo", "lo", "hi")) // 2.0 in (-inf, 2]
    assert(left.toSeq == Seq("lo", "hi", "hi"))  // 2.0 in [2, inf)
  }

  test("str splitn / inclusive split / toTime") {
    val df = DataFrame(Seq("a-b-c-d").toDF("t"))
    val r = df.select(
      col("t").str.splitn("-", 2).alias("s2"),
      col("t").str.split("-", inclusive = true).alias("inc")).toSpark.collect()(0)
    assert(r.getStruct(0).toSeq == Seq("a", "b-c-d"))
    assert(r.getSeq[String](1) == Seq("a-", "b-", "c-", "d"))
    val t = DataFrame(Seq("13:45:30").toDF("t"))
      .select(col("t").str.toTime().alias("ns")).toSpark.collect()(0).getLong(0)
    assert(t == ((13L * 3600 + 45 * 60 + 30) * 1000000000L))
  }

  test("dt base_utc_offset and dst_offset via tz rules") {
    val df = DataFrame(Seq("2024-01-15 12:00:00", "2024-07-15 12:00:00").toDF("s"))
      .withColumn("ts", col("s").cast(org.apache.spark.sql.types.TimestampType))
    val out = df.select(
      col("ts").dt.baseUtcOffset("America/New_York").alias("base"),
      col("ts").dt.dstOffset("America/New_York").alias("dst"),
      col("ts").dt.dstOffset("Australia/Sydney").alias("dst_au")).toSpark.collect()
    assert(out(0).getLong(0) == -5L * 3600 * 1000000) // EST standard
    assert(out(0).getLong(1) == 0L)                   // January: no US DST
    assert(out(1).getLong(1) == 3600L * 1000000)      // July: EDT
    assert(out(0).getLong(2) == 3600L * 1000000)      // January: Sydney DST on
    assert(out(1).getLong(2) == 0L)                   // July: Sydney DST off
  }

  test("dt isoYear at year boundaries") {
    val df = DataFrame(Seq("2021-01-01", "2020-12-31", "2024-12-30", "2023-07-15").toDF("d"))
      .withColumn("d", col("d").cast(org.apache.spark.sql.types.DateType))
    val out = df.select(col("d").dt.isoYear.alias("iy")).toSpark.collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2020, 2020, 2025, 2023))
  }

  test("list namespace") {
    val df = DataFrame(Seq(Seq(3, 1, 2), Seq(5, 5)).toDF("l"))
    val out = df.select(
      col("l").list.len.alias("n"),
      col("l").list.sum.alias("s"),
      col("l").list.max.alias("mx"),
      col("l").list.sort().alias("srt"),
      col("l").list.unique.list.len.alias("nu"),
      col("l").list.eval(e => e * 2).alias("dbl")).toSpark.collect()
    assert(out(0).getInt(0) == 3)
    assert(out(0).getInt(1) == 6) // polars: sum of list[i32] stays i32
    assert(out(0).getInt(2) == 3)
    assert(out(0).getSeq[Int](3) == Seq(1, 2, 3))
    assert(out(1).getInt(4) == 1)
    assert(out(0).getSeq[Int](5) == Seq(6, 2, 4))
  }

  test("dt namespace parts and truncate") {
    val df = DataFrame(Seq("2024-03-15 13:45:30").toDF("s"))
      .select(col("s").str.toDatetime().alias("ts"))
    val out = df.select(
      col("ts").dt.year.alias("y"),
      col("ts").dt.month.alias("m"),
      col("ts").dt.weekday.alias("wd"),
      col("ts").dt.truncate("1d").dt.strftime("%Y-%m-%d %H:%M:%S").alias("day"),
      col("ts").dt.truncate("15m").dt.strftime("%H:%M").alias("q15")).toSpark.collect()(0)
    assert(out.getInt(0) == 2024 && out.getByte(1) == 3) // month is i8 (polars dtype)
    assert(out.getByte(2) == 5) // 2024-03-15 is a Friday; weekday is i8
    assert(out.getString(3) == "2024-03-15 00:00:00")
    assert(out.getString(4) == "13:45")
  }

  test("str.extractGroups struct of named captures") {
    val df = DataFrame(Seq("Brand#42-red", "plain").toDF("t"))
    val out = df.select(
      col("t").str.extractGroups("Brand#([0-9]+)-([a-z]+)", Seq("num", "color")).alias("g"))
      .toSpark.select("g.num", "g.color").collect()
    assert(out(0).getString(0) == "42" && out(0).getString(1) == "red")
    assert(out(1).isNullAt(0) && out(1).isNullAt(1))
  }

  test("dt.castTimeUnit rescales ticks") {
    val df = DataFrame(Seq(1500000L).toDF("us"))
    val out = df.select(
      col("us").dt.castTimeUnit("us", "ms").alias("ms"),
      col("us").dt.castTimeUnit("us", "ns").alias("ns")).toSpark.collect()(0)
    assert(out.getLong(0) == 1500L)
    assert(out.getLong(1) == 1500000000L)
  }

  test("cut buckets") {
    val df = DataFrame(Seq(1.0, 5.0, 15.0).toDF("v"))
    val out = df.select(col("v").cut(Seq(3.0, 10.0), Some(Seq("lo", "mid", "hi"))).alias("b"))
      .toSpark.collect().map(_.getString(0)).toSeq
    assert(out == Seq("lo", "mid", "hi"))
  }

  test("horizontal aggregations") {
    val df = DataFrame(Seq((1, 10, 100)).toDF("a", "b", "c"))
    val out = df.select(
      Polars.sumHorizontal(col("a"), col("b"), col("c")).alias("s"),
      Polars.maxHorizontal(col("a"), col("b"), col("c")).alias("mx")).toSpark.collect()(0)
    assert(out.getInt(0) == 111)
    assert(out.getInt(1) == 100)
  }

  test("fold over columns at plan time") {
    val df = DataFrame(Seq((1, 2, 3)).toDF("a", "b", "c"))
    val folded = Polars.fold(lit(0), (acc, e) => acc + e, Seq(col("a"), col("b"), col("c")))
    assert(df.select(folded.alias("s")).toSpark.collect()(0).getInt(0) == 6)
  }
}
