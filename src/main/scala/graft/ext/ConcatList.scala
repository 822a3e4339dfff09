package graft.ext

import org.apache.spark.sql.catalyst.expressions.{Concat, CreateArray, Expression, RuntimeReplaceable}
import org.apache.spark.sql.types.ArrayType

/** polars concat_list (reference functions/lazy.rb concat_list;
  * list_expr.rb:772 golden uses it over two SCALAR i64 columns): scalar
  * inputs wrap into one-element lists, list inputs pass through, then all
  * concatenate element-wise. Spark's bare `concat` coerces scalar operands
  * to STRING concatenation, so the wrap must be type-directed — spelled as
  * a RuntimeReplaceable whose replacement is built lazily AFTER the
  * children resolve (constructor-time dataType would throw on unresolved
  * attributes). The optimizer swaps in the replacement, so execution is
  * plain codegen'd CreateArray/Concat — no interpreted path. */
case class ConcatList(inputs: Seq[Expression]) extends Expression with RuntimeReplaceable {
  override def children: Seq[Expression] = inputs
  override def prettyName: String = "graft_concat_list"

  override lazy val replacement: Expression = {
    val arrays = inputs.map {
      case c if c.dataType.isInstanceOf[ArrayType] => c
      case c => CreateArray(Seq(c))
    }
    if (arrays.size == 1) arrays.head else Concat(arrays)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(inputs = newChildren)
}
