package graft.api

import org.apache.spark.sql.{SparkSession, functions => F, DataFrame => SDF}
import org.apache.spark.sql.types._
import graft.expr.Expr

/** Named, typed 1-D column (reference: lib/polars/series.rb:35). On Spark this
  * is a one-column DataFrame with a retained name; eager accessors collect.
  * The unit of eager compute in the reference; here mostly a convenience shim —
  * distributed work should stay on frames.
  */
final case class Series(name: String, df: SDF) {
  def dtype: DataType = df.schema.head.dataType
  def len: Long = df.count()
  def toList: List[Any] = df.collect().map(r => r.get(0)).toList
  def rename(newName: String): Series = Series(newName, df.select(F.col(name).as(newName)))
  def toFrame: DataFrame = DataFrame(df)

  private def scalar(e: Expr): Any = df.select(e.col).collect()(0).get(0)
  def sum: Any = scalar(Expr(F.sum(F.col(name))))
  def mean: Any = scalar(Expr(F.avg(F.col(name))))
  def min: Any = scalar(Expr(F.min(F.col(name))))
  def max: Any = scalar(Expr(F.max(F.col(name))))
  def median: Any = scalar(Expr(F.median(F.col(name))))
  def std: Any = scalar(Expr(F.stddev_samp(F.col(name))))
  def nUnique: Long = df.select(F.countDistinct(F.col(name))).collect()(0).getLong(0)

  def map(e: Expr => Expr): Series = Series(name, df.select(e(Expr(F.col(name))).col.as(name)))
  def cast(dt: DataType): Series = map(_.cast(dt))
  def valueCounts(): DataFrame =
    DataFrame(df.groupBy(name).agg(F.count(F.lit(1)).as("count")).orderBy(F.col("count").desc))
}

object Series {
  /** Construct from a Scala seq (reference series.rb ctor from array). */
  def apply(name: String, values: Seq[Any])(implicit spark: SparkSession): Series = {
    import scala.jdk.CollectionConverters._
    val dt: DataType = values.collectFirst {
      case _: Int => IntegerType
      case _: Long => LongType
      case _: Double => DoubleType
      case _: String => StringType
      case _: Boolean => BooleanType
      case _: java.sql.Date => DateType
      case _: java.sql.Timestamp => TimestampType
    }.getOrElse(StringType)
    val rows = values.map(v => org.apache.spark.sql.Row(v)).asJava
    Series(name, spark.createDataFrame(rows, StructType(Seq(StructField(name, dt)))))
  }
}
