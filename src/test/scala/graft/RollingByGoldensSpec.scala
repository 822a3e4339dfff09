package graft

import graft.Polars._
import graft.api.DataFrame
import org.apache.spark.sql.{functions => F}

/** Round-14 port of the expr.rb rolling_*_by golden family (the 9
  * `rolling_<agg>_by` docstrings share one fixture: 25 hourly timestamps
  * with a row index, 2h windows). Values are the verbatim docstring
  * numbers, generated here from the documented closed-interval rule —
  * closed: "right" windows over hourly data hold rows (i-1, i], closed:
  * "both" hold [i-2? no — [t-2h, t], i.e. rows max(0, i-2)..i. */
class RollingByGoldensSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dfTemporal: DataFrame = {
    val rows = (0 until 25).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2001-01-${1 + i / 24}%02d ${i % 24}%02d:00:00"))
    }
    DataFrame(rows.toDF("index", "date"))
  }

  private def run(e: graft.expr.Expr): Seq[Option[Double]] =
    dfTemporal.withColumn("r", e).toSpark.select("r").collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.get(0).toString.toDouble)).toSeq

  // closed right: window (t-2h, t] = rows {max(0, i-1), i}
  private def rightWin(i: Int): Seq[Int] = (math.max(0, i - 1) to i)
  // closed both: window [t-2h, t] = rows {max(0, i-2) .. i}
  private def bothWin(i: Int): Seq[Int] = (math.max(0, i - 2) to i)

  test("rolling_min_by / rolling_max_by, 2h closed right (expr.rb goldens)") {
    assert(run(col("index").rollingMinBy(col("date"), "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).min.toDouble)))
    assert(run(col("index").rollingMaxBy(col("date"), "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).max.toDouble)))
  }

  test("rolling_mean_by / rolling_sum_by, closed right and both (expr.rb goldens)") {
    assert(run(col("index").rollingMeanBy(col("date"), "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).sum.toDouble / rightWin(i).size)))
    assert(run(col("index").rollingMeanBy(col("date"), "2h", closed = "both")) ==
      (0 until 25).map(i => Some(bothWin(i).sum.toDouble / bothWin(i).size)))
    assert(run(col("index").rollingSumBy(col("date"), "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).sum.toDouble)))
  }

  test("rolling_median_by and rolling_quantile_by nearest (expr.rb goldens)") {
    // 2-element windows: median = mean of the pair; quantile 0.25 nearest
    // picks the LOWER element (h = 0.25, frac < 0.5)
    assert(run(col("index").rollingMedianBy(col("date"), "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).sum.toDouble / rightWin(i).size)))
    assert(run(col("index").rollingQuantileBy(col("date"), 0.25, "2h")) ==
      (0 until 25).map(i => Some(rightWin(i).min.toDouble)))
  }

  test("rolling_std_by / rolling_var_by, closed right (expr.rb goldens)") {
    def varOf(w: Seq[Int]): Double = {
      if (w.size < 2) return 0.0 // polars renders 0.0 for the 1-row head window? no — null
      val m = w.sum.toDouble / w.size
      w.map(x => (x - m) * (x - m)).sum / (w.size - 1)
    }
    val stds = run(col("index").rollingStdBy(col("date"), "2h"))
    val vars = run(col("index").rollingVarBy(col("date"), "2h"))
    for (i <- 1 until 25) {
      assert(stds(i).exists(s => math.abs(s - math.sqrt(varOf(rightWin(i)))) < 1e-12), s"std at $i")
      assert(vars(i).exists(v => math.abs(v - varOf(rightWin(i))) < 1e-12), s"var at $i")
    }
  }
}
