package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Timezone offset components via the JVM tz database — the reference's
  * `dt.base_utc_offset` / `dt.dst_offset` (lib/polars/date_time_expr.rb:
  * 1367-1393, chrono-tz in the native engine). Input is epoch microseconds;
  * output is a Duration in microseconds: the zone's standard (non-DST) offset,
  * or the daylight-savings component in effect at that instant. Exact rules
  * (southern-hemisphere DST included), no fixed-offset approximation. */
case class TzOffset(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val actual = children.map(_.dataType)
    if (actual == Seq(LongType, StringType, BooleanType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tz_offset expects (long micros, string zone, bool dst), got $actual")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_tz_offset"

  override protected def nullSafeEval(us: Any, tz: Any, dst: Any): Any =
    TzOffset.offsetMicros(us.asInstanceOf[Long], tz.asInstanceOf[UTF8String],
      dst.asInstanceOf[Boolean])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (us, tz, dst) => s"graft.ext.TzOffset.offsetMicros($us, $tz, $dst)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TzOffset =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object TzOffset {
  private val zoneCache = new java.util.concurrent.ConcurrentHashMap[String, java.time.ZoneId]()

  def offsetMicros(micros: Long, tz: UTF8String, dst: Boolean): Long = {
    val zone = zoneCache.computeIfAbsent(tz.toString, java.time.ZoneId.of(_))
    val instant = java.time.Instant.ofEpochSecond(
      Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L)
    val rules = zone.getRules
    if (dst) rules.getDaylightSavings(instant).toMillis * 1000L
    else rules.getStandardOffset(instant).getTotalSeconds * 1000000L
  }
}
