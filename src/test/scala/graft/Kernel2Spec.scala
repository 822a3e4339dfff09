package graft

import graft.kernel.{Ewm, Interpolate}
import graft.api.DataFrame
import graft.Polars._
import org.apache.spark.sql.{functions => F}

class Kernel2Spec extends SparkSpec {
  import spark.implicits._

  private def approx(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-9

  test("ewm_mean adjust=true matches pandas/polars") {
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "x")
    val out = Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = true)
      .orderBy("i").collect().map(_.getDouble(2))
    val exp = Seq(1.0, 1.6666666666666667, 2.4285714285714284, 3.2666666666666666)
    assert(out.zip(exp).forall { case (a, b) => approx(a, b) })
  }

  test("ewm_mean adjust=false recursive form") {
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "x")
    val out = Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = false)
      .orderBy("i").collect().map(_.getDouble(2))
    assert(out.zip(Seq(1.0, 1.5, 2.25, 3.125)).forall { case (a, b) => approx(a, b) })
  }

  test("ewm var/std unbiased match pandas") {
    val df = Seq((0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)).toDF("i", "x")
    val out = Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = true,
      outputs = Seq("var", "std")).orderBy("i").collect()
    assert(out(0).isNullAt(2) && out(0).isNullAt(3))
    assert(approx(out(1).getDouble(2), 0.5))
    assert(approx(out(2).getDouble(2), 0.9285714285714284))
    assert(approx(out(3).getDouble(3), 1.1771636613972951))
  }

  test("ewm with by-groups resets state per group") {
    val df = Seq(("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 10.0), ("b", 1, 20.0))
      .toDF("g", "i", "x")
    val out = Ewm.ewm(df, "x", "i", by = Seq("g"), alpha = 0.5)
      .orderBy("g", "i").collect().map(_.getDouble(3))
    assert(approx(out(0), 1.0) && approx(out(1), 1.6666666666666667))
    assert(approx(out(2), 10.0) && approx(out(3), 16.666666666666668))
  }

  test("ewm ignore_nulls=false decays weights at null rows (pandas ignore_na=False)") {
    // pandas: [1, nan, 3, nan, nan, 5, 2].ewm(alpha=.5, ignore_na=False)
    val rows = Seq[(Int, java.lang.Double)]((0, 1.0), (1, null), (2, 3.0),
      (3, null), (4, null), (5, 5.0), (6, 2.0))
    val df = rows.toDF("i", "x")
    def nonNull(adjust: Boolean, ignore: Boolean): Seq[Double] =
      Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = adjust, ignoreNulls = ignore)
        .orderBy("i").collect().filter(!_.isNullAt(2)).map(_.getDouble(2)).toSeq
    val adjTignF = nonNull(adjust = true, ignore = false)
    assert(adjTignF.zip(Seq(1.0, 2.6, 4.6756756757, 2.9801980198))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, adjTignF.toString)
    // adjust=false renormalizes per observation (pandas old_wt reset) —
    // runs keylessly via the quadratic-map composition; pandas
    // ewm(alpha=.5, adjust=False, ignore_na=False) values
    val adjFignF = nonNull(adjust = false, ignore = false)
    assert(adjFignF.zip(Seq(1.0, 2.3333333333, 4.4666666667, 3.2333333333))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, adjFignF.toString)
    // the defaults are unchanged (ignore_nulls=true)
    val adjTignT = nonNull(adjust = true, ignore = true)
    assert(adjTignT.zip(Seq(1.0, 2.3333333333, 3.8571428571, 2.8666666667))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, adjTignT.toString)
    // var with absolute-position weights (pandas ewm var, ignore_na=False)
    val v = Ewm.ewm(df, "x", "i", alpha = 0.5, adjust = true,
      outputs = Seq("var"), ignoreNulls = false).orderBy("i").collect()
      .filter(!_.isNullAt(2)).map(_.getDouble(2))
    assert(v.zip(Seq(2.0, 3.1707317073, 3.9083728278))
      .forall { case (a, b) => math.abs(a - b) < 1e-9 }, v.mkString(","))

    // keyless cross-partition agreement: distributed result == sequential
    // reference on a null-bearing frame large enough to span partitions
    val rng = new scala.util.Random(11)
    val big = (0 until 4000).map(i =>
      (i, if (rng.nextInt(4) == 0) null else java.lang.Double.valueOf(rng.nextInt(100) / 7.0)))
    val bigDf = big.toDF("i", "x").repartition(13)
    val got = Ewm.ewm(bigDf, "x", "i", alpha = 0.3, adjust = true, ignoreNulls = false)
      .orderBy("i").collect().map(r => if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    var wSum = 0.0; var wx = 0.0; var seen = false
    val want = big.map { case (_, x) =>
      if (x == null) {
        if (seen) { wSum *= 0.7; wx *= 0.7 }
        None
      } else {
        seen = true
        wSum = 0.7 * wSum + 1.0; wx = 0.7 * wx + x.doubleValue()
        Some(wx / wSum)
      }
    }
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      (g, w) match {
        case (None, None) =>
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"row $i: $a vs $b")
        case other => fail(s"row $i: $other")
      }
    }
  }

  test("ewm alpha parameterizations") {
    assert(approx(Ewm.alphaFrom(com = Some(1.0)), 0.5))
    assert(approx(Ewm.alphaFrom(span = Some(3.0)), 0.5))
    assert(math.abs(Ewm.alphaFrom(halfLife = Some(1.0)) - 0.5) < 1e-12)
    intercept[IllegalArgumentException](Ewm.alphaFrom())
  }

  test("interpolate linear fills interior nulls, leaves edges") {
    val df = Seq[(Int, Option[Double])](
      (0, None), (1, Some(1.0)), (2, None), (3, None), (4, Some(4.0)), (5, None))
      .toDF("i", "v")
    val out = Interpolate.interpolate(df, "v", "i").orderBy("i").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    assert(out.toSeq == Seq(None, Some(1.0), Some(2.0), Some(3.0), Some(4.0), None))
  }

  test("interpolate nearest") {
    val df = Seq[(Int, Option[Double])](
      (0, Some(1.0)), (1, None), (2, None), (3, Some(10.0))).toDF("i", "v")
    val out = Interpolate.interpolate(df, "v", "i", method = "nearest")
      .orderBy("i").collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(1.0, 1.0, 10.0, 10.0))
  }

  test("rle_id and peaks over implicit row order") {
    val df = DataFrame(Seq(1, 1, 2, 2, 2, 1).toDF("v"))
    val rle = df.select(col("v"), col("v").rleId.alias("r")).toSpark
      .collect().map(_.getLong(1))
    assert(rle.toSeq == Seq(0L, 0L, 1L, 1L, 1L, 2L))
    val peaks = DataFrame(Seq(1, 3, 2, 5, 4).toDF("v"))
      .select(col("v").peakMax.alias("p")).toSpark.collect().map(_.getBoolean(0))
    assert(peaks.toSeq == Seq(false, true, false, true, false))
  }
}
