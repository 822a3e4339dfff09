package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, FloatType}

/** NaN → null, identity on every non-floating dtype (resolved at analysis
  * time, so the non-float path compiles to a pass-through).
  *
  * Exists for polars extrema semantics (reference expr.rb:1895-1978 and
  * series.rb max/min docstrings): plain `max`/`min` IGNORE NaN — max of
  * [-1.0, NaN, 1.0] is 1.0 — while Spark orders NaN greater than every
  * other numeric, so a bare F.max would surface NaN. Wrapping the aggregate
  * input in NanToNull makes the NaN invisible to the aggregate (nulls are
  * skipped) without touching integer/string/date columns, and keeps
  * whole-stage codegen. The NaN-PROPAGATING forms stay separate
  * (Expr.nanMax/nanMin — reference nan_max/nan_min). */
case class NanToNull(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_nan_to_null"

  private def isFloating: Boolean =
    child.dataType == DoubleType || child.dataType == FloatType

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case DoubleType => if (v.asInstanceOf[Double].isNaN) null else v
    case FloatType  => if (v.asInstanceOf[Float].isNaN) null else v
    case _          => v
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (!isFloating) {
      val c = child.genCode(ctx)
      ev.copy(code = c.code, isNull = c.isNull, value = c.value)
    } else {
      val wrapper = child.dataType match {
        case DoubleType => "java.lang.Double"
        case _          => "java.lang.Float"
      }
      nullSafeCodeGen(ctx, ev, c => s"""
        if ($wrapper.isNaN($c)) { ${ev.isNull} = true; } else { ${ev.value} = $c; }
      """)
    }

  override protected def withNewChildInternal(newChild: Expression): NanToNull =
    copy(child = newChild)
}
