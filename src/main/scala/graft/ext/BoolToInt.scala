package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType}

/** Boolean → int (true=1), identity on every other dtype — resolved at
  * analysis time, so the non-boolean path compiles to a pass-through (the
  * same shape as [[NanToNull]]; a RuntimeReplaceable spelling broke the
  * analyzer's window-expression extraction when the wrap sat under an
  * aggregate inside OVER).
  *
  * Exists for polars' numeric treatment of booleans under sum/mean
  * (vertical.rb:20 golden: `Polars.all.sum` over bool columns counts the
  * trues; series_test.rb test_mean: mean of bools is the fraction true) —
  * Spark's sum/avg reject BooleanType outright. */
case class BoolToInt(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    if (child.dataType == BooleanType) IntegerType else child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_bool_to_int"

  private def isBool: Boolean = child.dataType == BooleanType

  override def nullSafeEval(v: Any): Any =
    if (isBool) { if (v.asInstanceOf[Boolean]) 1 else 0 } else v

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!isBool) {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    } else {
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $c ? 1 : 0;")
    }

  override protected def withNewChildInternal(newChild: Expression): BoolToInt =
    copy(child = newChild)
}
