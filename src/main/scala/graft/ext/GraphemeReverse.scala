package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reverse a string by GRAPHEME CLUSTER, not code point (reference
  * string_expr.rb:1253 golden: "mañana" — decomposed ñ — reverses to
  * "anañam", the combining tilde staying attached to its base). Spark's
  * `reverse` flips code points, which detaches combining marks onto the
  * wrong base. Walks java.text.BreakIterator character boundaries. */
case class GraphemeReverse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_grapheme_reverse expects string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_grapheme_reverse"

  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(GraphemeReverse.reverse(s.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ext.GraphemeReverse.reverse($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): GraphemeReverse =
    copy(child = newChild)
}

object GraphemeReverse {
  def reverse(s: String): String = {
    val it = java.text.BreakIterator.getCharacterInstance(java.util.Locale.ROOT)
    it.setText(s)
    val sb = new java.lang.StringBuilder(s.length)
    var end = it.last()
    var start = it.previous()
    while (start != java.text.BreakIterator.DONE) {
      sb.append(s, start, end)
      end = start
      start = it.previous()
    }
    sb.toString
  }
}
