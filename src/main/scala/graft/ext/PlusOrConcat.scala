package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Concat, Expression, RuntimeReplaceable}
import org.apache.spark.sql.types.{DoubleType, NullType, StringType}

/** polars `+` is type-directed: Utf8 + Utf8 concatenates, anything else adds
  * (reference expr.rb `+` → Rust polars' `Expr::add`, whose string arm is
  * concat — data_frame.rb sum/fold goldens exercise it). graft's Expr surface
  * is untyped at composition time, so the dispatch must happen once the
  * children RESOLVE: a RuntimeReplaceable whose replacement is built lazily
  * AFTER analysis ([[ConcatList]] pattern — the optimizer's
  * ReplaceExpressions swaps it in, so execution is plain codegen'd
  * Concat/Add, no interpreted path).
  *
  * The numeric arm re-applies Spark's arithmetic widening explicitly
  * (TypeCoercion.findWiderTypeWithoutStringPromotion) because analyzer
  * implicit casts never descend into a lazy replacement. String+numeric is
  * deliberately NOT promoted — polars raises on str + int, and the raw Add
  * fails its type check with the real types in the message. */
case class PlusOrConcat(left: Expression, right: Expression)
    extends Expression with RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "graft_plus"

  override lazy val replacement: Expression = (left.dataType, right.dataType) match {
    case (StringType, StringType) => Concat(Seq(left, right))
    // a typed-null operand follows the other side's arm (result is null
    // either way; the spelling just has to type-check)
    case (StringType, NullType) => Concat(Seq(left, Cast(right, StringType)))
    case (NullType, StringType) => Concat(Seq(Cast(left, StringType), right))
    case (NullType, NullType) => Add(Cast(left, DoubleType), Cast(right, DoubleType))
    case (lt, rt) if lt == rt => Add(left, right)
    case (lt, rt) =>
      TypeCoercion.findWiderTypeWithoutStringPromotion(Seq(lt, rt)) match {
        case Some(t) =>
          Add(if (lt == t) left else Cast(left, t),
              if (rt == t) right else Cast(right, t))
        case None => Add(left, right) // invalid pair — Add's type check reports it
      }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(left = newChildren(0), right = newChildren(1))
}
