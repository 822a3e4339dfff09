package graft.ext

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First-appearance-ordered DISTINCT aggregate: the category listing of a
  * polars Categorical column (reference cat_expr.rb:16 golden —
  * [foo, bar, foo, foo, ham].get_categories → foo, bar, ham; polars assigns
  * category ids in ENCOUNTER order, so the listing is row-ordered). A
  * `collect_set` spelling has arbitrary cross-partition order; a
  * `collect_list`-then-dedup spelling buffers every ROW. This keeps one
  * (value → min row index) entry per DISTINCT value — state bounded by the
  * category domain (the Categorical contract: a small dictionary), never by
  * row count — and evaluates to the values sorted by first index.
  *
  * A TypedImperativeAggregate (map-valued buffers aren't expressible as
  * DeclarativeAggregate trees); runs under ObjectHashAggregate with normal
  * partial/merge distribution. */
case class FirstSeen(left: Expression, right: Expression,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
    with BinaryLike[Expression] {

  override def prettyName: String = "graft_first_seen"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_first_seen expects (string, bigint), got " +
        s"(${left.dataType}, ${right.dataType})")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val i = right.eval(input).asInstanceOf[Long]
      val k = v.asInstanceOf[UTF8String].toString
      if (buf.get(k).forall(_ > i)) buf(k) = i
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, i) => if (a.get(k).forall(_ > i)) a(k) = i }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toSeq.sortBy(_._2).map(kv => UTF8String.fromString(kv._1)))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (k, i) =>
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb); out.writeLong(i)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](in.getInt)
      in.get(kb)
      buf(new String(kb, "UTF-8")) = in.getLong
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FirstSeen =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FirstSeen =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstSeen =
    copy(left = newLeft, right = newRight)
}
