package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** `gcd`/`lcm` — in DataFusion 40's math library (SURVEY §2.9) but absent
  * from Spark's builtins. Implemented as codegen'd binary expressions on
  * Long (inputs cast by the registration shim). */
abstract class IntBinary extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT args, got (${left.dataType}, ${right.dataType})")
}

object IntMath {
  def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }
  def lcm(a: Long, b: Long): Long =
    if (a == 0 || b == 0) 0L else math.abs(a / gcd(a, b) * b)
}

case class Gcd(left: Expression, right: Expression) extends IntBinary {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntMath.gcd(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntMath.gcd($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "gcd"
}

case class Lcm(left: Expression, right: Expression) extends IntBinary {
  override protected def nullSafeEval(a: Any, b: Any): Any =
    IntMath.lcm(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntMath.lcm($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "lcm"
}
