package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) — the canonicalization step in
  * front of any text fingerprint/dedup (two byte-different encodings of the
  * same visible string must hash identically). Spark has no builtin; a
  * native Catalyst `Expression` with `doGenCode` keeps it inside whole-stage
  * codegen, calling the JDK normalizer exactly like Spark's own string
  * expressions call their static helpers. */
case class UnicodeNorm(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = children.map(_.dataType)
    if (actual == Seq(StringType, StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_unicode_norm expects (string, string), got $actual")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_unicode_norm"

  override protected def nullSafeEval(s: Any, f: Any): Any =
    UTF8String.fromString(UnicodeNorm.normalize(s.toString, f.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, f) =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.ext.UnicodeNorm.normalize($s.toString(), $f.toString()))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnicodeNorm =
    copy(left = newLeft, right = newRight)
}

object UnicodeNorm {
  /** Shared by interpreted eval and generated code. */
  def normalize(s: String, form: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form))
}
