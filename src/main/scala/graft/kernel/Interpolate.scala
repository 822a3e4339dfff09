package graft.kernel

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Null-gap interpolation (reference: lib/polars/expr.rb:3871 `interpolate`,
  * data_frame.rb:4628). Declarative window formulation: carry the last/next
  * non-null (position, value) pair and blend linearly — fully distributed:
  * partition by `by` keys when present; the keyless global order runs through
  * the prefix-scan kernel ([[Scan.filled]]), never a single-partition window.
  */
object Interpolate {

  /** Replace nulls in `valueCol` by linear interpolation between neighboring
    * non-nulls in `orderCol` order (leading/trailing nulls stay null; method
    * "nearest" picks the closer neighbor). */
  def interpolate(df: DataFrame, valueCol: String, orderCol: String,
                  by: Seq[String] = Nil, method: String = "linear",
                  outputCol: Option[String] = None): DataFrame = {
    val v = F.col(valueCol)
    val ord = F.col(orderCol).cast("double")
    def blend(prevV: org.apache.spark.sql.Column, prevO: org.apache.spark.sql.Column,
              nextV: org.apache.spark.sql.Column, nextO: org.apache.spark.sql.Column) =
      method match {
        case "linear" =>
          F.when(v.isNotNull, v.cast("double"))
            .when(prevV.isNotNull && nextV.isNotNull,
              prevV + (nextV - prevV) * (ord - prevO) / (nextO - prevO))
            .otherwise(F.lit(null))
        case "nearest" =>
          F.when(v.isNotNull, v.cast("double"))
            .when(prevV.isNotNull && nextV.isNotNull,
              F.when(ord - prevO <= nextO - ord, prevV).otherwise(nextV))
            .otherwise(F.lit(null))
      }
    if (by.nonEmpty) {
      val base = Window.partitionBy(by.map(F.col): _*)
      val wPrev = base.orderBy(F.col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = base.orderBy(F.col(orderCol)).rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val filled = blend(
        F.last(v.cast("double"), ignoreNulls = true).over(wPrev),
        F.last(F.when(v.isNotNull, ord), ignoreNulls = true).over(wPrev),
        F.first(v.cast("double"), ignoreNulls = true).over(wNext),
        F.first(F.when(v.isNotNull, ord), ignoreNulls = true).over(wNext))
      df.withColumn(outputCol.getOrElse(valueCol), filled)
    } else {
      // keyless: distributed forward/backward fill of (position, value) pairs
      val pair = F.when(v.isNotNull, F.struct(ord.as("o"), v.cast("double").as("x")))
      val d0 = RowIndex.reattachOrdered(df, F.col(orderCol))
      val d1 = Scan.filled(d0, pair, "__ip_prev__", backward = false)
      val d2 = Scan.filled(d1, pair, "__ip_next__", backward = true)
      val filled = blend(
        F.col("__ip_prev__.x"), F.col("__ip_prev__.o"),
        F.col("__ip_next__.x"), F.col("__ip_next__.o"))
      d2.withColumn(outputCol.getOrElse(valueCol), filled)
        .drop("__ip_prev__", "__ip_next__", RowIndex.name, Scan.BUCKET)
    }
  }
}
