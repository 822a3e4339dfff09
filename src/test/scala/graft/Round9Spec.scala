package graft

import graft.Polars._
import graft.api.LazyFrame
import graft.expr.Expr
import org.apache.spark.sql.{functions => F}

/** Round-8 late-session pins: group_by_dynamic closed/start_by parameters
  * (reference lazy_frame.rb:1416-1430 signature — closed left|right|both|none,
  * start_by window|datapoint|weekday). */
class Round9Spec extends SparkSpec {
  import spark.implicits._

  // 2021-12-16 00:00 .. 03:00 every 30 minutes (the polars doc dataset)
  private val t0 = java.time.LocalDateTime.of(2021, 12, 16, 0, 0)
    .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
  private lazy val df = LazyFrame(
    (0 until 7).map(i => (i.toLong, t0 + i * 1800000000L)).toDF("n", "tus")
      .withColumn("dt", F.timestamp_micros(F.col("tus"))).drop("tus"))

  private def run(closed: String = "left", startBy: String = "window",
                  every: String = "1h"): Map[Long, Seq[Long]] =
    df.groupByDynamic("dt", every = every, closed = closed, startBy = startBy)
      .agg(Expr(F.sort_array(F.collect_list(F.col("n")))).alias("ns"))
      .toSpark.collect()
      .map(r => ((r.getTimestamp(0).getTime * 1000 - t0) / 60000000L) ->
        r.getSeq[Long](1)).toMap

  test("group_by_dynamic closed=left (default): [s, s+1h) windows") {
    // 00:00→(0,1), 01:00→(2,3), 02:00→(4,5), 03:00→(6)
    assert(run() == Map(0L -> Seq(0L, 1L), 60L -> Seq(2L, 3L),
      120L -> Seq(4L, 5L), 180L -> Seq(6L)))
  }

  test("group_by_dynamic closed=right: (s, s+1h] windows, boundary rolls back") {
    // 23:00→(0), 00:00→(1,2), 01:00→(3,4), 02:00→(5,6)  [polars doc example]
    assert(run(closed = "right") == Map(-60L -> Seq(0L), 0L -> Seq(1L, 2L),
      60L -> Seq(3L, 4L), 120L -> Seq(5L, 6L)))
  }

  test("group_by_dynamic closed=both: boundary points join both windows") {
    val got = run(closed = "both")
    // every on-the-hour point (n even) also joins the previous window
    assert(got(-60L) == Seq(0L))
    assert(got(0L) == Seq(0L, 1L, 2L))
    assert(got(60L) == Seq(2L, 3L, 4L))
    assert(got(120L) == Seq(4L, 5L, 6L))
    assert(got(180L) == Seq(6L))
  }

  test("group_by_dynamic closed=none: boundary points join no window") {
    // strictly-inside points only: the half-hour points
    assert(run(closed = "none") == Map(0L -> Seq(1L), 60L -> Seq(3L),
      120L -> Seq(5L)))
  }

  test("group_by_dynamic start_by=datapoint anchors windows at the first point") {
    // drop n=0 so the first datapoint is 00:30; windows 00:30-01:30, ...
    val shifted = LazyFrame(df.toSpark.filter(F.col("n") > 0))
      .groupByDynamic("dt", every = "1h", startBy = "datapoint")
      .agg(Expr(F.sort_array(F.collect_list(F.col("n")))).alias("ns"))
      .toSpark.collect()
      .map(r => ((r.getTimestamp(0).getTime * 1000 - t0) / 60000000L) ->
        r.getSeq[Long](1)).toMap
    assert(shifted == Map(30L -> Seq(1L, 2L), 90L -> Seq(3L, 4L),
      150L -> Seq(5L, 6L)))
  }

  test("group_by_dynamic start_by=monday aligns weekly windows on Monday") {
    // 2021-12-16 is a Thursday; the covering Monday-start week is 2021-12-13
    val got = df.groupByDynamic("dt", every = "1w", startBy = "monday")
      .agg(Expr(F.count(F.lit(1))).alias("n"))
      .toSpark.collect()
    assert(got.length == 1)
    val start = got(0).getTimestamp(0).toLocalDateTime
    assert(start == java.time.LocalDateTime.of(2021, 12, 13, 0, 0), start)
    assert(got(0).getLong(1) == 7L)
  }

  test("group_by_dynamic on an integer index column matches the reference example") {
    // lazy_frame.rb:1390-1414: idx 0..5, A=[A,A,B,B,B,C], every 2i, period 3i,
    // closed right, include_boundaries → (-2,1,[A,A]) (0,3,[A,B,B])
    // (2,5,[B,B,C]) (4,7,[C]) with integer boundaries
    val d = LazyFrame(Seq((0L, "A"), (1L, "A"), (2L, "B"), (3L, "B"), (4L, "B"), (5L, "C"))
      .toDF("idx", "A"))
    val got = d.groupByDynamic("idx", every = "2i", period = Some("3i"),
        closed = "right", includeBoundaries = true)
      .agg(Expr(F.sort_array(F.collect_list(F.col("A")))).alias("a_list"))
      .toSpark.select("idx", "_lower_boundary", "_upper_boundary", "a_list")
      .orderBy("idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getSeq[String](3)))
    assert(got.toSeq == Seq(
      (-2L, -2L, 1L, Seq("A", "A")),
      (0L, 0L, 3L, Seq("A", "B", "B")),
      (2L, 2L, 5L, Seq("B", "B", "C")),
      (4L, 4L, 7L, Seq("C"))), got.toSeq)
  }

  test("frame rolling over an integer index column ('10i' trailing window)") {
    val d = LazyFrame((1L to 20L).map(i => (i, i * 2.0)).toDF("i", "v"))
    val got = d.rolling("i", "10i")
      .agg("n" -> Expr(F.count(F.lit(1))), "sv" -> col("v").sum)
      .toSpark.orderBy("i").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // window (i-10, i]: at i=5 → rows 1..5; at i=15 → rows 6..15
    assert(got(4) == ((5L, 5L, (1 to 5).map(_ * 2.0).sum)))
    assert(got(14) == ((15L, 10L, (6 to 15).map(_ * 2.0).sum)))
    // keyed variant shuffles per key
    val keyed = LazyFrame((1L to 20L).map(i => (i, s"k${i % 2}", i * 1.0)).toDF("i", "k", "v"))
      .rolling("i", "4i", by = Seq("k"))
      .agg("n" -> Expr(F.count(F.lit(1))))
      .toSpark.orderBy("i").collect().map(r => (r.getLong(0), r.getLong(2)))
    // per key, index gaps are 2 apart: window (i-4, i] holds 2 rows once warm
    assert(keyed(0) == ((1L, 1L)) && keyed(19) == ((20L, 2L)))
  }

  test("eager Series twins delegate through the expression bridge") {
    import graft.api.Series
    val s = Series("x", Seq(3.0, -1.0, 2.0, -4.0).toDF("x"))
    assert(s.abs.toList == List(3.0, 1.0, 2.0, 4.0))
    assert(s.cumSum().toList == List(3.0, 2.0, 4.0, 0.0))
    assert(s.rank("min").toList.map(String.valueOf) == List("4", "2", "3", "1"))
    assert(s.rollingSum(2).toList == List(null, 2.0, 1.0, -2.0))
    assert(s.shift(1).toList == List(null, 3.0, -1.0, 2.0))
    assert(s.clip(-2.0, 2.0).toList == List(2.0, -1.0, 2.0, -2.0))
    assert(s.head(2).toList == List(3.0, -1.0))
    assert(s.slice(1, 2).toList == List(-1.0, 2.0))
    val mask = Series("m", Seq(true, false, true, false).toDF("m"))
    assert(s.filter(mask).toList == List(3.0, 2.0))
    assert(Series("u", Seq(1, 2, 2, 3).toDF("u")).unique.len == 3)
    assert(Series("n", Seq(Some(1), None, Some(3)).toDF("n")).nullCount == 1L)
    assert(s.quantile(0.5, "linear") == 0.5)
  }

  test("Series describe emits the reference's dtype-specific stat rows") {
    import graft.api.Series
    val num = Series("v", Seq(Some(1.0), Some(3.0), None).toDF("v")).describe()
      .toSpark.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(num("count") == 3.0 && num("null_count") == 1.0 &&
      num("mean") == 2.0 && num("min") == 1.0 && num("max") == 3.0)
    val txt = Series("t", Seq("a", "a", "b").toDF("t")).describe()
      .toSpark.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(txt == Map("unique" -> 2L, "null_count" -> 0L, "count" -> 3L))
    val bool = Series("b", Seq(true, false, true).toDF("b")).describe()
      .toSpark.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bool == Map("sum" -> 2L, "null_count" -> 0L, "count" -> 3L))
  }

  test("skew/kurtosis bias and fisher corrections match the k-statistics formulas") {
    val xs = Seq(1.0, 2.0, 4.0, 8.0, 16.0)
    val d = LazyFrame(xs.toDF("x"))
    def get(e: graft.expr.Expr): Double =
      d.select(e.alias("r")).toSpark.collect()(0).getDouble(0)
    val n = xs.size.toDouble
    val m = xs.sum / n
    val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    val g1 = m3 / math.pow(m2, 1.5)
    val g2 = m4 / (m2 * m2) - 3
    assert(math.abs(get(col("x").skew()) - g1) < 1e-9)
    assert(math.abs(get(col("x").skew(bias = false)) -
      g1 * math.sqrt(n * (n - 1)) / (n - 2)) < 1e-9)
    assert(math.abs(get(col("x").kurtosis()) - g2) < 1e-9)
    val G2 = ((n - 1) / ((n - 2) * (n - 3))) * ((n + 1) * g2 + 6)
    assert(math.abs(get(col("x").kurtosis(bias = false)) - G2) < 1e-9)
    assert(math.abs(get(col("x").kurtosis(fisher = false, bias = false)) - (G2 + 3)) < 1e-9)
  }

  test("entropy defaults to base-2 with probability normalization") {
    val d = LazyFrame(Seq(1.0, 1.0, 2.0).toDF("p"))
    def get(e: graft.expr.Expr): Double =
      d.select(e.alias("r")).toSpark.collect()(0).getDouble(0)
    // normalized: p = [.25,.25,.5] → 1.5 bits
    assert(math.abs(get(col("p").entropy()) - 1.5) < 1e-9)
    // natural log, pre-normalized probabilities, normalize idempotent
    val probs = LazyFrame(Seq(0.25, 0.25, 0.5).toDF("p"))
    val e1 = probs.select(col("p").entropy(math.E, normalize = false).alias("r"))
      .toSpark.collect()(0).getDouble(0)
    assert(math.abs(e1 - 1.5 * math.log(2)) < 1e-9)
  }

  test("group_by_dynamic invalid closed/start_by raise directed errors") {
    val e1 = intercept[IllegalArgumentException] { run(closed = "weird") }
    assert(e1.getMessage.contains("closed must be"))
    val e2 = intercept[IllegalArgumentException] { run(startBy = "weird") }
    assert(e2.getMessage.contains("start_by must be"))
    val e3 = intercept[IllegalArgumentException] {
      df.groupByDynamic("dt", every = "1mo", startBy = "datapoint")
        .agg(Expr(F.count(F.lit(1))).alias("n")).toSpark
    }
    assert(e3.getMessage.contains("start_by"))
  }

  // ---- round-9 tail composition sweep: ewm through when/then and agg ----

  test("Expr ewm composes through when/then branches per key") {
    val rnd = new scala.util.Random(21)
    val data = Seq("a", "b").flatMap { k =>
      Seq.tabulate(30)(i => (k, i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 4 - 2)))
    }
    val sdf = data.map { case (k, i, v) => (k, i, v.map(Double.box).orNull) }
      .toDF("k", "i", "v")
    def seqAdj(xs: Seq[Option[Double]]): Seq[Option[Double]] = {
      var num = 0.0; var den = 0.0
      xs.map { case None => None; case Some(x) =>
        num = 0.7 * num + x; den = 0.7 * den + 1; Some(num / den) }
    }
    def seqShift(xs: Seq[Option[Double]]): Seq[Option[Double]] =
      Option.empty[Double] +: xs.dropRight(1)
    // polars: both branches evaluate over the FULL per-key series; the
    // condition selects per row
    val out = graft.api.DataFrame(sdf)
      .withColumn("e",
        when((col("i") % 2) === 0)
          .then(col("v").ewmMean(alpha = Some(0.3)))
          .otherwise(col("v").shift(1))
          .over(col("k")))
      .toSpark.select("k", "i", "e").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    Seq("a", "b").foreach { k =>
      val xs = data.filter(_._1 == k).map(_._3)
      val ew = seqAdj(xs); val sh = seqShift(xs)
      xs.indices.foreach { i =>
        val exp = if (i % 2 == 0) ew(i) else sh(i)
        (out((k, i.toLong)), exp) match {
          case (None, None) =>
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$k/$i")
          case (a, b) => fail(s"null mismatch $k/$i: $a vs $b")
        }
      }
    }
  }

  test("group_by().agg of an ewm chain yields per-group scalars") {
    val sdf = Seq(("a", 0L, 1.0), ("a", 1L, 3.0), ("a", 2L, 5.0),
      ("b", 0L, 2.0), ("b", 1L, 4.0)).toDF("k", "i", "v")
    // aggregate-of-scanned: last ewm value per group. This COMPUTES (the
    // GroupAggForm threads the per-group ewm through the agg) — pinned as
    // the one behavior; a regression to a directed error must fail here.
    val out = graft.api.DataFrame(sdf).groupBy("k")
      .agg(col("v").ewmMean(alpha = Some(0.5)).last.alias("e"))
      .toSpark.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // alpha=.5 adjust=true: a: [1, (0.5*1+3)/1.5=2.333.., (0.25+1.5+5)/1.75=3.857..]
    assert(math.abs(out("a") - (0.25 * 1 + 0.5 * 3 + 5.0) / 1.75) < 1e-9)
    assert(math.abs(out("b") - (0.5 * 2 + 4.0) / 1.5) < 1e-9)
  }

  test("Expr-level ewm routes the renorm flag pair keylessly (no refusal left)") {
    // [1, null, 10], alpha=.5, adjust=false, ignore_nulls=false:
    // old_wt decays twice across the gap -> (0.25*1 + 0.5*10)/0.75 = 7.0
    val sdf = Seq((0L, Some(1.0)), (1L, Option.empty[Double]), (2L, Some(10.0)))
      .toDF("i", "v")
    val out = graft.api.DataFrame(sdf)
      .withColumn("e", col("v").ewmMean(alpha = Some(0.5),
        adjust = false, ignoreNulls = false))
      .toSpark.orderBy("i").collect()
      .map(r => if (r.isNullAt(2)) null else r.getDouble(2))
    assert(out.toSeq == Seq(1.0, null, 7.0), out.toSeq.toString)
  }

  test("BoundedCache evicts beyond the cap and release drops the entry") {
    import graft.kernel.BoundedCache
    val frames = (1 to 5).map(i => Seq(i).toDF("x"))
    frames.foreach(f => BoundedCache.persistBounded(f, cap = 3))
    // oldest two evicted (unpersisted), newest three still cached
    assert(frames(0).storageLevel.useMemory == false)
    assert(frames(1).storageLevel.useMemory == false)
    assert(frames(4).storageLevel.useMemory == true)
    BoundedCache.release(frames(4))
    assert(frames(4).storageLevel.useMemory == false)
    frames.foreach(BoundedCache.release)
  }
}
