package graft.ext

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Coalesce, Expression, If, IsNull, Literal, Multiply}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ByteType, DataType, DoubleType, IntegerType, LongType, ShortType}

/** Dtype-preserving product aggregate (reference expr.rb:2039 / polars
  * semantics): product over an INTEGER column stays integer (promoted to
  * i64, same as polars promotes narrow ints), floats stay f64, and the
  * product of an empty / all-null group is the multiplicative identity 1 —
  * Spark's built-in `product` always returns double and yields null on
  * empty, both visible divergences in the golden corpus (cum_prod of
  * [1,2,3,4] must render 1/2/6/24 as i64, not 1.0/2.0/6.0/24.0).
  *
  * A DeclarativeAggregate: update/merge are catalyst expression trees, so
  * partial aggregation, whole-stage codegen and window use all come free. */
case class GraftProduct(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case _ => DoubleType
  }
  override def prettyName: String = "graft_product"

  private lazy val prod = AttributeReference("prod", dataType)()
  private lazy val one: Expression =
    if (dataType == LongType) Literal(1L) else Literal(1.0)
  private lazy val childCast: Expression =
    if (child.dataType == dataType) child else Cast(child, dataType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(prod)
  override lazy val initialValues: Seq[Expression] = Seq(Literal.create(null, dataType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(childCast), prod,
      If(IsNull(prod), childCast, Multiply(prod, childCast))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(prod.left), prod.right,
      If(IsNull(prod.right), prod.left, Multiply(prod.left, prod.right))))
  override lazy val evaluateExpression: Expression = Coalesce(Seq(prod, one))

  override protected def withNewChildInternal(newChild: Expression): GraftProduct =
    copy(child = newChild)
}
