package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `date_bin(stride, ts, origin)` — DataFusion 40's bucketing primitive
  * (reference exposure: `ctx.sql` at `iceberg-datafusion-arrow-flight/src/lib.rs:678`;
  * no Spark builtin). Buckets `ts` into the tumbling window of width
  * `stride` anchored at `origin`:
  *
  *   origin + floorDiv(ts - origin, stride) * stride
  *
  * All arithmetic is on microseconds: Spark `TimestampType` and ANSI
  * day-time intervals are both Long micros internally, so this is a pure
  * Long expression — fully codegen'd, no UDF boundary, safe inside
  * whole-stage codegen at any scale. `Math.floorDiv` (not `/`) keeps bins
  * aligned for timestamps before the origin.
  */
case class DateBin(stride: Expression, ts: Expression, anchor: Expression)
    extends TernaryExpression {

  override def first: Expression = stride
  override def second: Expression = ts
  override def third: Expression = anchor

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = stride.dataType.isInstanceOf[DayTimeIntervalType] &&
      second.dataType == TimestampType && third.dataType == TimestampType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"date_bin expects (day-time interval, timestamp, timestamp), got " +
        s"(${stride.dataType}, ${ts.dataType}, ${anchor.dataType})")
  }
  override def dataType: DataType = TimestampType
  override def nullable: Boolean =
    stride.nullable || ts.nullable || anchor.nullable

  override protected def nullSafeEval(s: Any, t: Any, o: Any): Any = {
    val strideUs = s.asInstanceOf[Long]
    val tsUs = t.asInstanceOf[Long]
    val originUs = o.asInstanceOf[Long]
    originUs + Math.floorDiv(tsUs - originUs, strideUs) * strideUs
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, t, o) =>
      s"${ev.value} = $o + java.lang.Math.floorDiv($t - $o, $s) * $s;")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(stride = newFirst, ts = newSecond, anchor = newThird)

  override def prettyName: String = "date_bin"
}
