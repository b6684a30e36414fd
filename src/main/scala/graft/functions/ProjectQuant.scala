package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Quantized sparse random projection — the per-row kernel of
  * [[graft.operators.RandomProjection]] (Achlioptas 2003 / JL
  * transform). Inputs are quantized to integers by `floor(x · 2^b)`
  * (float→double widening and the power-of-two multiply are both exact
  * IEEE ops), then projected through a constant {−1, 0, +1} sign
  * matrix with pure integer adds — so the output is bit-exact under
  * ANY partitioning or evaluation order, and a SQL oracle can replay
  * it. One tight loop per row inside whole-stage codegen; the
  * declarative `transform(sequence(..), j -> aggregate(..))` form
  * would run outDim × inDim interpreted lambda evals per row.
  */
case class ProjectQuant(
    child: Expression, signs: Seq[Seq[Int]], scaleBits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"project_quant expects array<float|double>, got $other")
  }

  @transient private lazy val m: Array[Array[Int]] =
    signs.map(_.toArray).toArray
  private def isD: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType
  private def scale: Double = java.lang.Math.scalb(1.0, scaleBits)

  override protected def nullSafeEval(input: Any): Any =
    ProjectQuant.projectRow(input.asInstanceOf[ArrayData], isD, m, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("signs", m, "int[][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.ProjectQuant.projectRow($in, $isD, $ref, $scale)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "project_quant"
}

object ProjectQuant {

  /** out[j] = Σ_i signs[j][i] · floor(v[i] · scale) — all-integer after
    * the exact quantize. The helper must NOT be named `eval`. */
  def projectRow(v: ArrayData, isDouble: Boolean,
      signs: Array[Array[Int]], scale: Double): ArrayData = {
    val n = v.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      val x = if (isDouble) v.getDouble(i) else v.getFloat(i).toDouble
      q(i) = math.floor(x * scale).toLong
      i += 1
    }
    val out = new Array[Long](signs.length)
    var j = 0
    while (j < signs.length) {
      val row = signs(j)
      val m = math.min(n, row.length)
      var acc = 0L
      var k = 0
      while (k < m) {
        val s = row(k)
        if (s == 1) acc += q(k) else if (s == -1) acc -= q(k)
        k += 1
      }
      out(j) = acc
      j += 1
    }
    new GenericArrayData(out)
  }
}
