package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| of two SORTED, DISTINCT string arrays in ONE merge walk —
  * the [[graft.operators.SetJoin]] verify kernel. The verify dominates
  * an exact set-similarity join's runtime (it runs once per candidate
  * pair), and Spark's `array_intersect` evaluates INTERPRETED on string
  * arrays: `nullSafeEval` builds a `SQLOpenHashSet` + output buffer per
  * ROW (collectionOperations.scala:4600, Spark 4.1) — a per-candidate
  * allocation storm, and it materializes the intersection array when
  * the join only needs its SIZE. Sorting each side's tokens ONCE per
  * set (`array_sort`, n·log n, paid |corpus| times) converts every
  * per-pair intersection into an allocation-free two-pointer walk over
  * `UTF8String.binaryCompare` (paid |candidates| times — the quadratic
  * term), exactly the classic ppjoin verify layout (Xiao et al.
  * WWW '08 §2).
  *
  * Contract: both inputs ascending in UTF8String binary order (what
  * `array_sort` produces) with no duplicates and no nulls —
  * [[graft.operators.SetJoin]]'s prep guarantees all three. Count
  * equality with `size(array_intersect(a, b))` on such inputs is
  * pinned by spec and ScalaCheck property.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count expects (array<string>, array<string>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetKernels.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SetKernels.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

object SetKernels {

  /** Two-pointer merge count over ascending (UTF8String binary order)
    * duplicate-free arrays. Zero allocation beyond the UTF8String
    * views `ArrayData.getUTF8String` hands out. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).binaryCompare(b.getUTF8String(j))
      if (c == 0) { n += 1L; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }
}
