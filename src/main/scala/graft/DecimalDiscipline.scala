package graft

import org.apache.spark.sql.{functions => F, Column}
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.expr.Expr

/** Exact-sum discipline for driver-gated queries (q_bucketed_join precedent;
  * enforced by [[OracleLint]]): accumulate raw-double aggregates in DECIMAL so
  * the driver's exact value hash is independent of partial-agg addition order
  * — a plan change that reorders the partials flipped q_salted_join's hash in
  * round 10 while every value still matched at rtol 1e-5. The testdata's
  * DOUBLE columns are all exactly 2-decimal (money/rate/quantity values), so
  * `scale`=2 casts are lossless; products of two/three such columns use
  * scale 4/6. Present the result as DOUBLE to match the oracle's
  * `CAST(sum(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`.
  */
private[graft] object DecimalDiscipline {
  def decSum(e: Expr, scale: Int): Expr =
    e.cast(DecimalType(18, scale)).sum.cast(DoubleType)

  /** Order-free mean: exact decimal sum ÷ non-null count — one double
    * division on both engines instead of order-sensitive accumulation.
    * The zero divisor is NULLed: polars' mean of an empty slice is null,
    * and the sum identity 0 over a 0 count would otherwise give NaN. */
  def decMean(e: Expr, scale: Int): Expr = {
    val n = e.count
    decSum(e, scale) / Expr(F.nullif(n.col, F.lit(0L)), n.requiresIndex, n.preps)
  }

  def decSumCol(c: Column, scale: Int): Column =
    F.sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  def decMeanCol(c: Column, scale: Int): Column = decSumCol(c, scale) / F.count(c)
}
