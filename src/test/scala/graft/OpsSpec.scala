package graft

import graft.Polars._
import graft.api.{DataFrame, Series}
import graft.expr.Expr
import org.apache.spark.sql.types._
import org.apache.spark.sql.{functions => F}

class OpsSpec extends SparkSpec {
  import spark.implicits._
  private implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("qcut buckets by quantile") {
    val df = DataFrame((1 to 8).toDF("v"))
    val out = df.select(col("v"), col("v").qcut(Seq(0.5), Seq("lo", "hi")).alias("b"))
      .toSpark.collect().map(r => (r.getInt(0), r.getString(1)))
    assert(out.count(_._2 == "lo") == 4 && out.count(_._2 == "hi") == 4)
    assert(out.filter(_._1 <= 4).forall(_._2 == "lo"))
    // null values bucket to null, not the last label
    val withNull = DataFrame(Seq(Some(1), None, Some(3)).toDF("v"))
      .select(col("v").qcut(Seq(0.5), Seq("lo", "hi")).alias("b"))
      .toSpark.collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    assert(withNull.count(_ == null) == 1 && withNull.count(_ != null) == 2)
  }

  test("searchSorted / argMin / argMax / argTrue on series") {
    val s = Series("x", Seq(1.0, 3.0, 5.0, 7.0))
    assert(s.searchSorted(4.0) == 2L)
    assert(s.searchSorted(5.0, side = "left") == 2L)
    assert(s.searchSorted(5.0, side = "right") == 3L)
    val u = Series("x", Seq(5.0, 1.0, 9.0))
    assert(u.argMin == 1L && u.argMax == 2L)
    assert(Series("b", Seq(false, true, false, true)).argTrue.toList == List(1L, 3L))
    // arg_min/arg_max ignore nulls (polars), never return a null row's index
    val n = Series("x", Seq[java.lang.Double](null, 5.0, null, 1.0, 9.0).toDF("x"))
    assert(n.argMin == 3L && n.argMax == 4L)
    // arg_sort: nulls first by default, last with nulls_last; stable ties
    assert(n.argSort().toList == List(0L, 2L, 3L, 1L, 4L))
    assert(n.argSort(nullsLast = true).toList == List(3L, 1L, 4L, 0L, 2L))
    assert(n.argSort(descending = true).toList == List(0L, 2L, 4L, 1L, 3L))
    // sort: polars nulls-first default both directions; top/bottom_k skip
    // nulls; reverse flips row order
    assert(n.sort().toList == List(null, null, 1.0, 5.0, 9.0))
    assert(n.sort(descending = true).toList == List(null, null, 9.0, 5.0, 1.0))
    assert(n.sort(nullsLast = true).toList == List(1.0, 5.0, 9.0, null, null))
    assert(n.topK(2).toList == List(9.0, 5.0))
    assert(n.bottomK(2).toList == List(1.0, 5.0))
    assert(n.topK(4).toList == List(9.0, 5.0, 1.0, null))
    assert(n.reverse.toList == List(9.0, 1.0, null, 5.0, null))
    // search_sorted counts nulls as smallest (they sort first): inserting
    // 0.5 into [null, null, 1, 5, 9] keeps sorted order at index 2
    assert(n.searchSorted(0.5) == 2L)
    assert(n.searchSorted(5.0, side = "right") == 4L)
  }

  test("uniqueCounts in first-seen order") {
    val s = Series("k", Seq("b", "a", "b", "c", "b", "a"))
    assert(s.uniqueCounts.toList == List(3L, 2L, 1L))
  }

  test("argSort permutation") {
    val s = Series("x", Seq(30, 10, 20))
    assert(s.argSort().toList == List(1L, 2L, 0L))
  }

  test("extendConstant and shrinkDtype") {
    val s = Series("x", Seq(1L, 2L)).extendConstant(9L, 2)
    assert(s.toList == List(1L, 2L, 9L, 9L))
    assert(Series("x", Seq(1L, 100L)).shrinkDtype.dtype == ByteType)
    assert(Series("x", Seq(1L, 40000L)).shrinkDtype.dtype == IntegerType)
  }

  test("cumulativeEval expanding aggregate") {
    // expanding mean = scan(sum)/scan(count): the decomposable-kind spelling
    // (the arbitrary-aggregate overload was removed — it planned a
    // single-partition window over the data)
    val df = DataFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val out = df.select(
      (col("v").cumulativeEval(F.sum, "sum") /
        col("v").cumulativeEval(F.count, "sum")).alias("m")).toSpark
      .collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(1.0, 1.5, 2.0, 2.5))
  }

  test("rollingSumWeighted applies weights oldest-first") {
    val df = DataFrame(Seq(1.0, 2.0, 3.0, 4.0).toDF("v"))
    val out = df.select(col("v").rollingSumWeighted(Seq(0.5, 1.0, 2.0)).alias("w"))
      .toSpark.collect().map(r => Option(r.get(0)))
    // full windows only: [1,2,3] -> 0.5+2+6=8.5 ; [2,3,4] -> 1+3+8=12
    assert(out.toSeq == Seq(None, None, Some(8.5), Some(12.0)))
  }

  test("selectByDtype and regex selectors") {
    val df = DataFrame(Seq((1, "a", 2.0)).toDF("i", "s", "d"))
    assert(df.selectByDtype(IntegerType, DoubleType).columns == Seq("i", "d"))
    assert(df.selectRegex("^[sd]$").columns == Seq("s", "d"))
    assert(df.exclude("s").columns == Seq("i", "d"))
  }

  test("prefixAll / suffixAll") {
    val df = DataFrame(Seq((1, 2)).toDF("a", "b"))
    assert(df.prefixAll("x_").columns == Seq("x_a", "x_b"))
    assert(df.suffixAll("_y").columns == Seq("a_y", "b_y"))
  }

  test("unstack long to wide: vertical default and horizontal (data_frame.rb:3180)") {
    val df = DataFrame(Seq(1, 2, 3, 4, 5, 6).toDF("v"))
    // step = OUTPUT row count; 6 rows / step 3 = 2 parts. vertical fills
    // parts from consecutive blocks: v_0 = rows 0-2, v_1 = rows 3-5
    val vert = df.unstack(3)
    assert(vert.columns == Seq("v_0", "v_1"))
    assert(vert.toSpark.collect().map(_.toSeq).toSeq ==
      Seq(Seq(1, 4), Seq(2, 5), Seq(3, 6)))
    val horiz = df.unstack(3, how = "horizontal")
    assert(horiz.columns == Seq("v_0", "v_1"))
    assert(horiz.toSpark.collect().map(_.toSeq).toSeq ==
      Seq(Seq(1, 2), Seq(3, 4), Seq(5, 6)))
  }

  test("alignFrames aligns key universes") {
    val a = DataFrame(Seq((1, "a1"), (2, "a2")).toDF("k", "av"))
    val b = DataFrame(Seq((2, "b2"), (3, "b3")).toDF("k", "bv"))
    val Seq(a2, b2) = Polars.alignFrames(Seq(a, b), "k")
    assert(a2.toSpark.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(b2.toSpark.collect().map(r => Option(r.getString(1)).orNull).toSeq ==
      Seq(null, "b2", "b3"))
  }

  test("lower/upper bound literals") {
    val df = DataFrame(Seq(1).toDF("x"))
    val r = df.select(
      col("x").lowerBound(LongType).alias("lo"),
      col("x").upperBound(IntegerType).alias("hi")).toSpark.collect()(0)
    assert(r.getLong(0) == Long.MinValue && r.getInt(1) == Int.MaxValue)
  }

  test("frame egress surface: get_column, item, hash_rows, pipe, column surgery, upsample") {
    val df = DataFrame(Seq((1, "a", 1.0), (2, "b", 2.0)).toDF("k", "s", "v"))
    assert(df.getColumn("s").toList == List("a", "b"))
    assert(df.getColumns.map(_.name) == Seq("k", "s", "v"))
    assert(df.toSeries(2).toList == List(1.0, 2.0))
    assert(df.dtypes.map(_.typeName) == Seq("integer", "string", "double"))
    assert(DataFrame(Seq(42).toDF("x")).item() == 42)
    intercept[IllegalArgumentException](df.item())
    assert(df.hashRows().len == 2)
    assert(df.pipe(_.height) == 2L)
    val ins = df.insertColumn(1, Series("z", Seq(9, 8)))
    assert(ins.columns == Seq("k", "z", "s", "v"))
    val repl = df.replaceColumn("s", Series("s", Seq("x", "y")))
    assert(repl.columns == Seq("k", "s", "v"))
    assert(repl.getColumn("s").toList == List("x", "y"))
    // unknown column and length mismatch are errors, not silent no-ops/truncation
    intercept[IllegalArgumentException](df.replaceColumn("nope", Series("nope", Seq(1, 2))))
    intercept[IllegalArgumentException](df.insertColumn(0, Series("short", Seq(1))))
    // upsample: per-group daily grid between own bounds, nulls on fill rows
    val ts = DataFrame(Seq(
      ("g1", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0),
      ("g1", java.sql.Timestamp.valueOf("2024-01-03 00:00:00"), 3.0))
      .toDF("g", "t", "v"))
    val up = ts.upsample("t", "1d", by = Seq("g")).sortBy(Seq(col("t"))).toSpark.collect()
    assert(up.length == 3)
    assert(up(1).isNullAt(2)) // inserted Jan-02 row has null v
  }

  test("series scalar/pred/shim surface: variance, gather, ewm, dtype checks") {
    val s = Series("x", Seq(1.0, 2.0, 3.0, 4.0))
    assert(math.abs(s.variance.asInstanceOf[Double] - 5.0 / 3) < 1e-12)
    assert(s.isNumeric && s.isFloat && !s.isBoolean && !s.isUtf8)
    assert(s.gather(Seq(3L, 0L)).toList == List(4.0, 1.0))
    assert(s.gather(Seq(1L, 1L)).toList == List(2.0, 2.0)) // duplicates allowed
    intercept[IllegalArgumentException](s.gather(Seq(0L, 99L))) // OOB raises
    assert(s.take(Seq(1L)).toList == List(2.0))
    assert(s.cleared.len == 0 && s.cleared.dtype == s.dtype)
    assert(s.chunkLengths.sum == 4L)
    // ewm_mean adjust=true over [1,2]: second value = (2 + 0.5*1)/(1.5) for alpha=0.5
    val em = Series("x", Seq(1.0, 2.0)).ewmMean(alpha = 0.5).toList
    // com parameterization: com=1 <=> alpha=0.5 (reference _prepare_alpha)
    assert(Series("x", Seq(1.0, 2.0)).ewmMean(com = Some(1.0)).toList == em)
    intercept[IllegalArgumentException] {
      Series("x", Seq(1.0)).ewmMean(com = Some(1.0), alpha = 0.5)
    }
    assert(math.abs(em(1).asInstanceOf[Double] - (2.0 + 0.5) / 1.5) < 1e-12)
    // shuffle is a seeded permutation; sample is seeded-deterministic
    val big = Series("x", (1 to 50).map(_.toDouble))
    val sh = big.shuffle(7).toList
    assert(sh.toSet == big.toList.toSet && sh == big.shuffle(7).toList)
    assert(big.sample(0.5, seed = 9).toList == big.sample(0.5, seed = 9).toList)
  }

  test("functions sweep: cum_sum_horizontal, from_epoch, ranges, ones/zeros, arg_*") {
    val df = DataFrame(Seq((1, 10, 100), (2, 20, 200)).toDF("a", "b", "c"))
    val cs = df.select(Polars.cumSumHorizontal(
        "a" -> col("a"), "b" -> col("b"), "c" -> col("c")).alias("cs"))
      .toSpark.select("cs.a", "cs.b", "cs.c").collect()
    assert(cs(0).toSeq == Seq(1, 11, 111) && cs(1).toSeq == Seq(2, 22, 222))
    val ep = DataFrame(Seq((1704067200L, 1704067200000000L)).toDF("s", "us"))
      .select(Polars.fromEpoch(col("s"), "s").alias("ts"),
        Polars.fromEpoch(col("us"), "us").alias("tu"),
        Polars.fromEpoch(col("us") * 1000, "ns").alias("tn"))
      .toSpark.collect()(0)
    assert(ep.getTimestamp(0) == ep.getTimestamp(1) && ep.getTimestamp(1) == ep.getTimestamp(2))
    val tr = DataFrame(Seq(1).toDF("x"))
      .select(Polars.timeRange(0L, 7200L * 1000000000L, "1h").alias("r"))
      .toSpark.collect()(0).getSeq[Long](0)
    assert(tr == Seq(0L, 3600000000000L, 7200000000000L))
    assert(Polars.ones(3).toList == List(1.0, 1.0, 1.0))
    assert(Polars.zeros(2).toList == List(0.0, 0.0))
    assert(Polars.repeatSeries("x", 2).toList == List("x", "x"))
    val d2 = DataFrame(Seq((5, "b"), (3, "a"), (9, "c")).toDF("v", "s"))
    assert(Polars.argWhere(d2, col("v") > 4).toList == List(0L, 2L))
    assert(Polars.argSortBy(d2, Seq(col("v"))).toList == List(1L, 0L, 2L))
    assert(Polars.argSortBy(d2, Seq(col("v")), Seq(true)).toList == List(2L, 0L, 1L))
    val at2 = DataFrame(Seq((1.0, 1.0)).toDF("y", "x"))
      .select(Polars.arctan2d(col("y"), col("x")).alias("deg")).toSpark.collect()(0).getDouble(0)
    assert(math.abs(at2 - 45.0) < 1e-9)
  }

  test("frame-level aggregates: one-row per-column, numeric-only nulls") {
    val df = DataFrame(Seq((1, "b", 2.0), (3, "a", 4.0)).toDF("i", "s", "v"))
    val mx = df.maxFrame.toSpark.collect()(0)
    assert(mx.getInt(0) == 3 && mx.getString(1) == "b" && mx.getDouble(2) == 4.0)
    val sm = df.sumFrame.toSpark.collect()(0)
    assert(sm.getLong(0) == 4L && sm.isNullAt(1) && sm.getDouble(2) == 6.0)
    val mean = df.meanFrame.toSpark.collect()(0)
    assert(mean.getDouble(0) == 2.0 && mean.isNullAt(1))
    val nc = DataFrame(Seq[(Integer, String)]((1, null), (null, "x"), (2, "y"))
      .toDF("a", "b")).nullCount.toSpark.collect()(0)
    assert(nc.getLong(0) == 1L && nc.getLong(1) == 1L)
    val sd = df.stdFrame(ddof = 0).toSpark.collect()(0)
    assert(math.abs(sd.getDouble(2) - 1.0) < 1e-12) // pop std of [2,4]
  }

  test("series rle and arg_unique") {
    val s = Series("x", Seq("a", "a", "b", "b", "b", "a"))
    val runs = s.rle.toList.map { case r: org.apache.spark.sql.Row => (r.getLong(0), r.getString(1)) }
    assert(runs == List((2L, "a"), (3L, "b"), (1L, "a")))
    assert(s.argUnique.toList == List(0L, 2L))
  }

  test("series reshape: 2-D, inferred dim, flatten, errors") {
    val s = Series("x", Seq(1, 2, 3, 4, 5, 6))
    val r = s.reshape(Seq(2, 3))
    assert(r.toList == List(Seq(1, 2, 3), Seq(4, 5, 6)))
    val inferred = s.reshape(Seq(-1, 2))
    assert(inferred.toList == List(Seq(1, 2), Seq(3, 4), Seq(5, 6)))
    val back = inferred.reshape(Seq(-1))
    assert(back.toList == List(1, 2, 3, 4, 5, 6))
    intercept[IllegalArgumentException](s.reshape(Seq(4, 2)))
    intercept[IllegalArgumentException](s.reshape(Seq(-1, 4)))
    intercept[IllegalArgumentException](s.reshape(Seq(-1, -1)))
    // nulls survive the grouped collect
    val withNull = Series("y", Seq[Any](1, null, 3, 4))(spark)
    assert(Series("y", withNull.df.selectExpr("CAST(y AS INT) AS y")).reshape(Seq(2, 2)).toList ==
      List(Seq(1, null), Seq(3, 4)))
  }

  test("groupBy partitionBy eager split") {
    val df = DataFrame(Seq(("a", 1), ("b", 2), ("a", 3)).toDF("k", "v"))
    val parts = df.partitionBy(Seq("k"))
    assert(parts.size == 2)
    assert(parts(Seq("a")).toSpark.collect().map(_.getInt(1)).sorted.toSeq == Seq(1, 3))
  }
}
