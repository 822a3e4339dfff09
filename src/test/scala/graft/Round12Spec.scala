package graft

import graft.Polars._
import graft.api.{DataFrame, LazyFrame}
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-9 late pins: polars' implicit implode in group_by().agg
  * (aggregate-free exprs -> per-group ordered lists, constants stay
  * scalars) and order-dependent exprs inside group_by_dynamic windows
  * (fixed + calendar paths now delegate to the full GroupBy machinery). */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("agg of a bare column implodes to an ordered null-preserving list") {
    val df = DataFrame(Seq(
      ("a", Some(1.0)), ("b", Some(10.0)), ("a", None), ("b", Some(20.0)), ("a", Some(3.0)))
      .map { case (k, v) => (k, v.map(Double.box).orNull) }.toDF("k", "v"))
    val got = df.groupBy("k").agg(col("v")).toSpark.orderBy("k").collect()
      .map(r => r.getString(0) ->
        r.getSeq[java.lang.Double](1).map(Option(_).map(_.toDouble)).toSeq).toMap
    assert(got("a") == Seq(Some(1.0), None, Some(3.0))) // row order, nulls kept
    assert(got("b") == Seq(Some(10.0), Some(20.0)))
  }

  test("agg of an elementwise expression implodes; literals broadcast as scalars") {
    val df = DataFrame(Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"))
    val out = df.groupBy("k")
      .agg((col("v") * 2).alias("dbl"), Polars.lit(7).alias("c"),
        col("v").sum.alias("s"))
      .toSpark.orderBy("k").collect()
    assert(out(0).getSeq[Double](1) == Seq(2.0, 4.0))
    assert(out(0).getInt(2) == 7)  // literal: scalar per group, not a list
    assert(out(0).getDouble(3) == 3.0)
    assert(out(1).getSeq[Double](1) == Seq(10.0))
  }

  private def tsFrame = {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    LazyFrame(Seq(
      (at(0), 1.0), (at(10), 2.0), (at(70), 3.0), (at(130), 4.0))
      .toDF("ts", "v"))
  }

  test("group_by_dynamic agg of cum_sum: per-window running-sum lists (tumbling)") {
    val got = tsFrame.groupByDynamic("ts", every = "1h")
      .agg(col("v").cumSum().alias("cs"))
      .toSpark.orderBy("ts").collect()
      .map(_.getSeq[Double](1).toSeq)
    assert(got.toSeq == Seq(Seq(1.0, 3.0), Seq(3.0), Seq(4.0)))
  }

  test("group_by_dynamic agg of cum_sum: sliding windows restart the scan per window") {
    val got = tsFrame.groupByDynamic("ts", every = "1h", period = Some("2h"))
      .agg(col("v").cumSum().alias("cs"))
      .toSpark.orderBy("ts").collect()
      .map(r => r.getTimestamp(0).toString -> r.getSeq[Double](1).toSeq).toMap
    // [-1h,1h): rows 1,2; [0,2h): 1,2,3; [1h,3h): 3,4; [2h,4h): 4
    assert(got("2024-02-29 23:00:00.0") == Seq(1.0, 3.0))
    assert(got("2024-03-01 00:00:00.0") == Seq(1.0, 3.0, 6.0))
    assert(got("2024-03-01 01:00:00.0") == Seq(3.0, 7.0))
    assert(got("2024-03-01 02:00:00.0") == Seq(4.0))
  }

  test("group_by_dynamic agg of aggregate-of-scanned: per-window scalars") {
    val got = tsFrame.groupByDynamic("ts", every = "1h")
      .agg(col("v").shift(1).sum.alias("s"), Expr(F.count(F.lit(1))).alias("n"))
      .toSpark.orderBy("ts").collect()
      .map(r => (if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getLong(2)))
    // window 1: shift(1) of [1,2] = [null,1] -> sum 1; singleton windows
    // shift to [null] -> sum 0 (polars: sum over an empty/all-null slice is
    // the additive identity — expr.rb:2713 filter golden)
    assert(got(0) == (Some(1.0), 2L))
    assert(got(1) == (Some(0.0), 1L) && got(2) == (Some(0.0), 1L))
  }

  test("rolling().agg bare-column implodes to trailing-window lists, keyed and keyless") {
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(min: Long) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val df = LazyFrame(Seq(
      ("a", at(0), 1.0), ("a", at(30), 2.0), ("a", at(90), 3.0),
      ("b", at(10), 10.0)).toDF("k", "ts", "v"))
    // keyed: trailing 1h window (t-1h, t]
    val keyed = df.rolling("ts", "1h", by = Seq("k"))
      .agg("vs" -> col("v"))
      .toSpark.orderBy("k", "ts").select("vs").collect().map(_.getSeq[Double](0).toSeq)
    assert(keyed.toSeq == Seq(Seq(1.0), Seq(1.0, 2.0), Seq(3.0), Seq(10.0)))
    // keyless: same shape through the phantom-carry kernel
    val keyless = df.rolling("ts", "1h")
      .agg("vs" -> col("v"), "sv" -> col("v").sum)
      .toSpark.orderBy("ts").select("vs", "sv").collect()
      .map(r => (r.getSeq[Double](0).toSeq, r.getDouble(1)))
    assert(keyless.map(_._1).toSeq ==
      Seq(Seq(1.0), Seq(1.0, 10.0), Seq(1.0, 10.0, 2.0), Seq(3.0)))
    assert(keyless.map(_._2).toSeq == Seq(1.0, 11.0, 13.0, 3.0))
  }

  test("group_by_dynamic bare-column agg implodes per window; calendar path too") {
    val fixed = tsFrame.groupByDynamic("ts", every = "1h").agg(col("v").alias("vs"))
      .toSpark.orderBy("ts").collect().map(_.getSeq[Double](1).toSeq)
    assert(fixed.toSeq == Seq(Seq(1.0, 2.0), Seq(3.0), Seq(4.0)))
    // calendar windows: two months of data, cum_sum per month window
    val t1 = java.sql.Timestamp.valueOf("2024-01-05 00:00:00")
    val t2 = java.sql.Timestamp.valueOf("2024-01-20 00:00:00")
    val t3 = java.sql.Timestamp.valueOf("2024-02-03 00:00:00")
    val cal = LazyFrame(Seq((t1, 1.0), (t2, 2.0), (t3, 5.0)).toDF("ts", "v"))
      .groupByDynamic("ts", every = "1mo")
      .agg(col("v").cumSum().alias("cs"))
      .toSpark.orderBy("ts").collect().map(_.getSeq[Double](1).toSeq)
    assert(cal.toSeq == Seq(Seq(1.0, 3.0), Seq(5.0)))
  }
}
