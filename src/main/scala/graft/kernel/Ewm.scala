package graft.kernel

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types._

/** Exponentially-weighted moving aggregates (reference: lib/polars/expr.rb:
  * 6381-6444 `ewm_mean/ewm_std/ewm_var`, alpha prep expr.rb:7169; native
  * ext/polars/src/expr/general.rs:757).
  *
  * The recursion y_i = f(y_{i-1}, x_i) is inherently sequential, so this is
  * one of the few places where `mapPartitions` beats any declarative
  * formulation (SURVEY §7: custom work list). Scale shape: repartition by the
  * group keys, sort within partitions by (keys, order), then stream each
  * partition once with O(1) state per group — no per-group collect, no window
  * over a single global partition unless there are no keys (in which case the
  * semantics themselves are global-sequential, same as the reference).
  */
object Ewm {

  /** Translate the reference's com/span/half_life parameterizations to alpha
    * (reference: lib/polars/expr.rb:7169 `_prepare_alpha`). */
  def alphaFrom(com: Option[Double] = None, span: Option[Double] = None,
                halfLife: Option[Double] = None, alpha: Option[Double] = None): Double =
    (com, span, halfLife, alpha) match {
      case (Some(c), None, None, None) => 1.0 / (1.0 + c)
      case (None, Some(sp), None, None) => 2.0 / (sp + 1.0)
      case (None, None, Some(h), None) => 1.0 - math.exp(-math.log(2.0) / h)
      case (None, None, None, Some(a)) => a
      case _ => throw new IllegalArgumentException("specify exactly one of com/span/half_life/alpha")
    }

  /** Append `<valueCol>_ewm_mean` (and optionally `_ewm_var`/`_ewm_std`)
    * computed per `by`-group in `orderCol` order.
    *
    * adjust=true:  y_i = Σ w_j x_j / Σ w_j with w_j=(1-α)^(i-j)  (polars default)
    * adjust=false: y_i = (1-α) y_{i-1} + α x_i
    * Variance uses the same weighting with bias=false correction like polars.
    */
  def ewm(df: DataFrame, valueCol: String, orderCol: String,
          by: Seq[String] = Nil, alpha: Double = 0.5, adjust: Boolean = true,
          minPeriods: Int = 1, outputs: Seq[String] = Seq("mean")): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha in (0, 1]")
    val spark = df.sparkSession
    val partitioned =
      if (by.nonEmpty)
        df.repartition(by.map(F.col): _*)
          .sortWithinPartitions((by.map(F.col) :+ F.col(orderCol)): _*)
      else df.coalesce(1).sortWithinPartitions(F.col(orderCol))

    val schema = outputs.foldLeft(df.schema) { (sc, o) =>
      sc.add(s"${valueCol}_ewm_$o", DoubleType, nullable = true)
    }
    val vIdx = df.schema.fieldIndex(valueCol)
    val byIdx = by.map(df.schema.fieldIndex)
    val beta = 1.0 - alpha

    val rdd = partitioned.rdd.mapPartitions { it =>
      // running state, reset on group-key change
      var key: Seq[Any] = null
      var wSum, wx, wx2, w2Sum = 0.0 // Σw, Σw·x, Σw·x², Σw²
      var n = 0
      it.map { row =>
        val k = byIdx.map(row.get)
        if (key == null || k != key) { key = k; wSum = 0; wx = 0; wx2 = 0; w2Sum = 0; n = 0 }
        val x = row.get(vIdx) match {
          case null => Double.NaN
          case v: Number => v.doubleValue()
        }
        val outs: Seq[Any] =
          if (x.isNaN) outputs.map(_ => null) // nulls pass through, state unchanged
          else {
            if (adjust) {
              wSum = beta * wSum + 1.0; wx = beta * wx + x
              wx2 = beta * wx2 + x * x; w2Sum = beta * beta * w2Sum + 1.0
            } else {
              if (n == 0) { wSum = 1.0; wx = x; wx2 = x * x; w2Sum = 1.0 }
              else {
                wSum = 1.0 // weights sum to 1 in recursive form
                wx = beta * wx + alpha * x
                wx2 = beta * wx2 + alpha * x * x
                w2Sum = beta * beta * w2Sum + alpha * alpha
              }
            }
            n += 1
            val mean = wx / wSum
            val varBiased = math.max(wx2 / wSum - mean * mean, 0.0)
            val denom = 1.0 - w2Sum / (wSum * wSum)
            val varUnbiased = if (denom > 0) varBiased / denom else Double.NaN
            outputs.map {
              case "mean" => if (n >= minPeriods) mean else null
              case "var" => if (n >= minPeriods && n > 1 && !varUnbiased.isNaN) varUnbiased else null
              case "std" => if (n >= minPeriods && n > 1 && !varUnbiased.isNaN) math.sqrt(varUnbiased) else null
            }
          }
        Row.fromSeq(row.toSeq ++ outs)
      }
    }
    spark.createDataFrame(rdd, schema)
  }
}
