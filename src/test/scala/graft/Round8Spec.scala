package graft

import scala.util.Random
import graft.kernel.Ewm

/** Round-8 pins: the renormalizing EWM recursion (adjust=false,
  * ignore_nulls=false), calendar-duration group_by_dynamic / frame rolling,
  * and calendar dt.round. */
class Round8Spec extends SparkSpec {
  import spark.implicits._

  // ---- ewm adjust=false, ignore_nulls=false (reference expr.rb:6381-6444) ----

  /** Independent sequential reference: the pandas `old_wt` recursion for
    * ignore_na=False, adjust=False (the definition, not the kernel). */
  private def seqEwmRenorm(xs: Seq[Option[Double]], alpha: Double)
    : Seq[Option[(Double, Double)]] = {
    val beta = 1 - alpha
    var mean = Double.NaN; var cov = 0.0
    var sumWt = 1.0; var sumWt2 = 1.0; var oldWt = 1.0
    var nobs = 0L
    xs.map {
      case None =>
        if (!mean.isNaN) { sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta }
        None
      case Some(x) =>
        if (mean.isNaN) { mean = x; cov = 0.0; sumWt = 1.0; sumWt2 = 1.0; oldWt = 1.0 }
        else {
          sumWt *= beta; sumWt2 *= beta * beta; oldWt *= beta
          val om = mean
          if (mean != x) mean = (oldWt * om + alpha * x) / (oldWt + alpha)
          cov = (oldWt * (cov + (om - mean) * (om - mean)) +
            alpha * (x - mean) * (x - mean)) / (oldWt + alpha)
          sumWt += alpha; sumWt2 += alpha * alpha; oldWt += alpha
          sumWt /= oldWt; sumWt2 /= oldWt * oldWt; oldWt = 1.0
        }
        nobs += 1
        val num = sumWt * sumWt
        val den = num - sumWt2
        Some((mean, if (den > 0) (num / den) * cov else Double.NaN))
    }
  }

  test("keyed ewm adjust=false ignore_nulls=false matches the renormalizing recursion") {
    val rnd = new Random(42)
    val keys = Seq("a", "b", "c")
    val data = keys.flatMap { k =>
      Seq.tabulate(200)(i => (k, i.toLong,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 10 - 5)))
    }
    val df = data.toDF("k", "i", "x").repartition(5)
    val out = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.35,
      adjust = false, ignoreNulls = false, outputs = Seq("mean", "var"))
    val got = out.orderBy("k", "i").collect().map { r =>
      if (r.isNullAt(3)) None
      else Some((r.getDouble(3), if (r.isNullAt(4)) Double.NaN else r.getDouble(4)))
    }
    val exp = keys.flatMap(k => seqEwmRenorm(data.filter(_._1 == k).map(_._3), 0.35))
    assert(got.length == exp.length)
    got.zip(exp).zipWithIndex.foreach { case ((g, e), i) =>
      (g, e) match {
        case (None, None) =>
        case (Some((gm, gv)), Some((em, ev))) =>
          assert(math.abs(gm - em) < 1e-9, s"mean mismatch at $i: $gm vs $em")
          assert(gv.isNaN && ev.isNaN || math.abs(gv - ev) < 1e-9,
            s"var mismatch at $i: $gv vs $ev")
        case _ => fail(s"null mismatch at $i: $g vs $e")
      }
    }
  }

  test("renorm recursion differs from the linear form across a null gap (sanity)") {
    // x = [1, null, 10] with alpha=0.5:
    //   ignore_nulls=true  → mean3 = 0.5*1 + 0.5*10 = 5.5
    //   ignore_nulls=false → old_wt decays twice: (0.25*1 + 0.5*10)/0.75 = 7.0
    val df = Seq(("g", 0L, Some(1.0)), ("g", 1L, None), ("g", 2L, Some(10.0)))
      .toDF("k", "i", "x")
    val strict = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.5,
      adjust = false, ignoreNulls = false)
      .orderBy("i").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(strict.toSeq == Seq(1.0, null, 7.0), strict.toSeq.toString)
    val ign = Ewm.ewm(df, "x", "i", by = Seq("k"), alpha = 0.5,
      adjust = false, ignoreNulls = true)
      .orderBy("i").collect().map(r => if (r.isNullAt(3)) null else r.getDouble(3))
    assert(ign.toSeq == Seq(1.0, null, 5.5), ign.toSeq.toString)
  }

  test("keyless ewm adjust=false ignore_nulls=false raises the directed error") {
    val df = Seq((0L, 1.0), (1L, 2.0)).toDF("i", "x")
    val ex = intercept[IllegalArgumentException] {
      Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = false, ignoreNulls = false)
    }
    assert(ex.getMessage.contains("keyless"))
  }

  // ---- dt.round calendar durations (reference date_time_expr.rb:107-216) ----

  test("dt.round 1mo/1q/1y maps each half-interval to the nearer boundary") {
    import graft.Polars._
    val ts = Seq(
      "2021-01-10 00:00:00", // first half of Jan (mid = Jan 16 12:00) → Jan 1
      "2021-01-17 00:00:00", // second half → Feb 1
      "2021-02-14 23:59:59", // Feb 2021 mid = Feb 15 00:00 → Feb 1
      "2021-02-15 00:00:00", // midpoint inclusive → Mar 1
      "2021-07-02 11:59:59", // 2021 mid = Jul 2 12:00 → 2021-01-01
      "2021-07-02 12:00:00") // → 2022-01-01
    val df = graft.api.DataFrame(
      ts.zipWithIndex.map { case (t, i) => (i, java.sql.Timestamp.valueOf(t)) }
        .toDF("i", "ts"))
    val out = df.select(
      col("i"),
      col("ts").dt.round("1mo").cast(org.apache.spark.sql.types.StringType).alias("mo"),
      col("ts").dt.round("1q").cast(org.apache.spark.sql.types.StringType).alias("q"),
      col("ts").dt.round("1y").cast(org.apache.spark.sql.types.StringType).alias("y"))
      .toSpark.orderBy("i").collect()
    val mo = out.map(_.getString(1)).toSeq
    assert(mo == Seq("2021-01-01 00:00:00", "2021-02-01 00:00:00",
      "2021-02-01 00:00:00", "2021-03-01 00:00:00",
      "2021-07-01 00:00:00", "2021-07-01 00:00:00"), mo.toString)
    val q = out.map(_.getString(2)).toSeq
    // Q1 2021 (90 d) mid = Feb 15 00:00; Q3 (92 d) mid = Aug 16 00:00
    assert(q == Seq("2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2021-04-01 00:00:00",
      "2021-07-01 00:00:00", "2021-07-01 00:00:00"), q.toString)
    val y = out.map(_.getString(3)).toSeq
    assert(y == Seq("2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2021-01-01 00:00:00",
      "2021-01-01 00:00:00", "2022-01-01 00:00:00"), y.toString)
  }
}
