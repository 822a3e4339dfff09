package graft.kernel

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window

/** Null-gap interpolation (reference: lib/polars/expr.rb:3871 `interpolate`,
  * data_frame.rb:4628). Declarative window formulation: carry the last/next
  * non-null value and its position, blend linearly — two window passes, fully
  * distributed (partition by `by` keys; global order only when keyless,
  * matching the reference's sequential semantics).
  */
object Interpolate {

  /** Replace nulls in `valueCol` by linear interpolation between neighboring
    * non-nulls in `orderCol` order (leading/trailing nulls stay null; method
    * "nearest" picks the closer neighbor). */
  def interpolate(df: DataFrame, valueCol: String, orderCol: String,
                  by: Seq[String] = Nil, method: String = "linear",
                  outputCol: Option[String] = None): DataFrame = {
    val base = if (by.nonEmpty) Window.partitionBy(by.map(F.col): _*) else Window.partitionBy()
    val wPrev = base.orderBy(F.col(orderCol)).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = base.orderBy(F.col(orderCol)).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val v = F.col(valueCol)
    val ord = F.col(orderCol).cast("double")
    val prevV = F.last(v, ignoreNulls = true).over(wPrev)
    val nextV = F.first(v, ignoreNulls = true).over(wNext)
    val prevO = F.last(F.when(v.isNotNull, ord), ignoreNulls = true).over(wPrev)
    val nextO = F.first(F.when(v.isNotNull, ord), ignoreNulls = true).over(wNext)
    val filled = method match {
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
    df.withColumn(outputCol.getOrElse(valueCol), filled)
  }
}
