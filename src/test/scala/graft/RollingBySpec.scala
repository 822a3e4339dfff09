package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** rolling_*_by parity (reference expr.rb:3964-4970): each row aggregates the
  * rows whose `by` timestamp falls in its own trailing temporal window, for
  * all four `closed` modes, plain and `.over(keys)`, against a brute-force
  * local reference on seeded random data with duplicate timestamps and null
  * values. */
class RollingBySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(20260814)
  private val n = 300
  // (id, key, epoch µs, nullable value); duplicate timestamps on purpose
  private val rows: IndexedSeq[(Long, String, Long, Option[Double])] =
    (0 until n).map { i =>
      val base = 1700000000000000L + rng.nextInt(2000).toLong * 500000L
      (i.toLong, s"k${rng.nextInt(4)}", base,
        if (rng.nextInt(6) == 0) None else Some((rng.nextInt(200) - 100) / 4.0))
    }
  private lazy val df = DataFrame(rows
    .map { case (i, k, t, v) => (i, k, t, v.map(Double.box).orNull) }
    .toDF("id", "k", "tus", "v")
    .withColumn("ts", F.timestamp_micros(F.col("tus")))
    .repartition(7))

  private val wsMicros = 60L * 1000000 // "1m"

  private def inWindow(tj: Long, ti: Long, closed: String): Boolean = closed match {
    case "right" => tj > ti - wsMicros && tj <= ti
    case "both"  => tj >= ti - wsMicros && tj <= ti
    case "left"  => tj >= ti - wsMicros && tj < ti
    case "none"  => tj > ti - wsMicros && tj < ti
  }

  /** Brute-force: per row, aggregate non-null values in its window (within
    * the same group when keyed). */
  private def expected(closed: String, keyed: Boolean, minPeriods: Int = 1)
      (agg: Seq[Double] => Double): Map[Long, Option[Double]] =
    rows.map { case (i, k, ti, _) =>
      val vs = rows.filter { case (_, kj, tj, vj) =>
        (!keyed || kj == k) && vj.isDefined && inWindow(tj, ti, closed)
      }.flatMap(_._4)
      i -> (if (vs.size >= math.max(minPeriods, 1)) Some(agg(vs)) else None)
    }.toMap

  private def engine(e: graft.expr.Expr): Map[Long, Option[Double]] =
    df.withColumn("r", e).toSpark
      .select(F.col("id"), F.col("r").cast("double")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  private def assertClose(got: Map[Long, Option[Double]],
                          exp: Map[Long, Option[Double]]): Unit = {
    assert(got.keySet == exp.keySet)
    for ((id, e) <- exp) (got(id), e) match {
      case (Some(g), Some(x)) => assert(math.abs(g - x) < 1e-9, s"row $id: $g vs $x")
      case (g, x)             => assert(g == x, s"row $id: $g vs $x")
    }
  }

  for (closed <- Seq("right", "both", "left", "none")) {
    test(s"rolling_sum_by plain closed=$closed matches brute force") {
      assertClose(engine(col("v").rollingSumBy(col("ts"), "1m", closed = closed)),
        expected(closed, keyed = false)(_.sum))
    }
    test(s"rolling_mean_by over(k) closed=$closed matches brute force") {
      assertClose(
        engine(col("v").rollingMeanBy(col("ts"), "1m", closed = closed).over(col("k"))),
        expected(closed, keyed = true)(vs => vs.sum / vs.size))
    }
  }

  test("rolling_min/max_by keyed match brute force") {
    assertClose(engine(col("v").rollingMinBy(col("ts"), "1m").over(col("k"))),
      expected("right", keyed = true)(_.min))
    assertClose(engine(col("v").rollingMaxBy(col("ts"), "1m").over(col("k"))),
      expected("right", keyed = true)(_.max))
  }

  test("rolling_std/var_by respect ddof and min_periods") {
    def sampVar(vs: Seq[Double], ddof: Int): Double = {
      val m = vs.sum / vs.size
      vs.map(x => (x - m) * (x - m)).sum / (vs.size - ddof)
    }
    assertClose(engine(col("v").rollingVarBy(col("ts"), "1m", minPeriods = 2)),
      expected("right", keyed = false, minPeriods = 2)(sampVar(_, 1)))
    assertClose(engine(col("v").rollingStdBy(col("ts"), "1m", minPeriods = 2, ddof = 0)),
      expected("right", keyed = false, minPeriods = 2)(vs => math.sqrt(sampVar(vs, 0))))
  }

  test("rolling_median_by = linear-interpolated window median") {
    def median(vs: Seq[Double]): Double = {
      val s = vs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    assertClose(engine(col("v").rollingMedianBy(col("ts"), "1m").over(col("k"))),
      expected("right", keyed = true)(median))
  }

  test("rolling_quantile_by nearest on the window") {
    // q=0.25 nearest over the sorted window, h = (n-1)q
    def qNearest(vs: Seq[Double]): Double = {
      val s = vs.sorted
      val h = (s.size - 1) * 0.25
      val lo = s(h.toInt); val hi = s(math.ceil(h).toInt)
      if (h - math.floor(h) >= 0.5) hi else lo // half rounds away from zero (polars)
    }
    assertClose(engine(col("v").rollingQuantileBy(col("ts"), 0.25, "1m")),
      expected("right", keyed = false)(qNearest))
  }

  // ---- calendar windows (mo/q/y): bucket-join kernel, keyless + keyed ----

  // months-spanning dataset: random timestamps across ~14 months incl.
  // month-end days (the day-clamping regime), duplicate timestamps, nulls
  private val calRows: IndexedSeq[(Long, String, java.time.LocalDateTime, Option[Double])] = {
    val r = new scala.util.Random(99)
    val start = java.time.LocalDateTime.of(2023, 1, 15, 6, 30)
    (0 until 220).map { i =>
      val t = start.plusDays(r.nextInt(420).toLong).plusHours(r.nextInt(24).toLong)
      (i.toLong, s"g${r.nextInt(3)}", t,
        if (r.nextInt(7) == 0) None else Some((r.nextInt(100) - 50) / 2.0))
    }
  }
  private lazy val calDf = DataFrame(calRows
    .map { case (i, k, t, v) =>
      (i, k, t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L, v.map(Double.box).orNull)
    }
    .toDF("id", "k", "tus", "v")
    .withColumn("ts", F.timestamp_micros(F.col("tus")))
    .repartition(5))

  /** Brute force: window (t - months, t] with java.time month arithmetic —
    * minusMonths day-clamps exactly like Spark's `- INTERVAL n MONTH`. */
  private def calExpected(months: Int, closed: String, keyed: Boolean)
      (agg: Seq[Double] => Double): Map[Long, Option[Double]] =
    calRows.map { case (i, k, ti, _) =>
      val lo = ti.minusMonths(months.toLong)
      val vs = calRows.filter { case (_, kj, tj, vj) =>
        val loOk = if (closed == "left" || closed == "both") !tj.isBefore(lo) else tj.isAfter(lo)
        val hiOk = if (closed == "right" || closed == "both") !tj.isAfter(ti) else tj.isBefore(ti)
        (!keyed || kj == k) && vj.isDefined && loOk && hiOk
      }.flatMap(_._4)
      i -> (if (vs.nonEmpty) Some(agg(vs)) else None)
    }.toMap

  private def calEngine(e: graft.expr.Expr): Map[Long, Option[Double]] =
    calDf.withColumn("r", e).toSpark
      .select(F.col("id"), F.col("r").cast("double")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

  for (closed <- Seq("right", "both", "left", "none")) {
    test(s"calendar rolling_sum_by 1mo keyless closed=$closed matches brute force") {
      assertClose(calEngine(col("v").rollingSumBy(col("ts"), "1mo", closed = closed)),
        calExpected(1, closed, keyed = false)(_.sum))
    }
  }

  test("calendar rolling_mean/max_by over(k) — 1q and 1y windows") {
    assertClose(calEngine(col("v").rollingMeanBy(col("ts"), "1q").over(col("k"))),
      calExpected(3, "right", keyed = true)(vs => vs.sum / vs.size))
    assertClose(calEngine(col("v").rollingMaxBy(col("ts"), "1y").over(col("k"))),
      calExpected(12, "right", keyed = true)(_.max))
  }

  test("calendar rolling_std_by respects ddof and min_periods gating") {
    def std(vs: Seq[Double]): Double = {
      val m = vs.sum / vs.size
      math.sqrt(vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1))
    }
    val expGated = calRows.map { case (i, _, ti, _) =>
      val lo = ti.minusMonths(1L)
      val vs = calRows.filter { case (_, _, tj, vj) =>
        vj.isDefined && tj.isAfter(lo) && !tj.isAfter(ti)
      }.flatMap(_._4)
      i -> (if (vs.size >= 2) Some(std(vs)) else None)
    }.toMap
    assertClose(calEngine(col("v").rollingStdBy(col("ts"), "1mo", minPeriods = 2)), expGated)
  }

  test("calendar window sizes mixing fixed units are rejected") {
    val e = intercept[IllegalArgumentException] {
      calDf.withColumn("r", col("v").rollingSumBy(col("ts"), "1mo2d")).toSpark.collect()
    }
    assert(e.getMessage.contains("pure month multiples"))
  }

  test("reference docstring example: hourly index rolling_sum_by 2h (right/both)") {
    // expr.rb rolling_sum_by @example: 25 hourly timestamps, index 0..24
    val base = java.time.LocalDateTime.of(2001, 1, 1, 0, 0)
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val d = DataFrame((0 until 25).map(i => (i.toLong, base + i * 3600000000L))
      .toDF("index", "tus")
      .withColumn("date", F.timestamp_micros(F.col("tus"))))
    def run(closed: String): Seq[Long] =
      d.withColumn("s", col("index").rollingSumBy(col("date"), "2h", closed = closed))
        .toSpark.orderBy("index").select("s").collect().map(_.getLong(0)).toSeq
    // docstring: right-closed tail ... 39 41 43 45 47; both-closed 57 60 63 66 69
    val right = run("right")
    assert(right.take(5) == Seq(0L, 1L, 3L, 5L, 7L), right)
    assert(right.takeRight(5) == Seq(39L, 41L, 43L, 45L, 47L), right)
    val both = run("both")
    assert(both.take(5) == Seq(0L, 1L, 3L, 6L, 9L), both)
    assert(both.takeRight(5) == Seq(57L, 60L, 63L, 66L, 69L), both)
  }

  test("elementwise composition carries through: (2*rolling_sum_by) over keys") {
    val exp = expected("right", keyed = true)(_.sum).map {
      case (k, v) => k -> v.map(_ * 2)
    }
    assertClose(
      engine((col("v").rollingSumBy(col("ts"), "1m") * 2).over(col("k"))), exp)
  }
}
