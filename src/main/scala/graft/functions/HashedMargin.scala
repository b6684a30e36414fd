package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Linear-model margin over hashed word features in ONE pass — the
  * [[graft.operators.QualityClassifier]] scorer as a codegen kernel,
  * the zero-shuffle 100 TB scoring path (the relational formulation
  * explodes every word through two exchanges; a TRAINED model is just
  * `dim` longs, so scoring is a pure projection).
  *
  * Value-identical by construction to the relational chain the DuckDB
  * oracle replays: tokens are maximal non-ASCII-whitespace runs of
  * `UTF8String.toLowerCase` (exactly `filter(split(lower(text),
  * "\\s+"), _ != "")` — [[graft.operators.Dedup.words]]), each token's
  * bucket is the first 4 bytes of its md5 as an unsigned int mod `dim`
  * (exactly `conv(substring(md5(w), 1, 8), 16, 10) % dim`), and the
  * margin is the exact int64 Σ weight(bucket) over token OCCURRENCES.
  * Why a kernel: per-word md5 via the declarative explode→join→agg
  * pays two shuffles; via HOF lambdas it runs interpreted
  * (STATUS round-10 invariant: hot per-element loops are kernels). */
case class HashedMargin(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "weights must have dim entries")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_margin expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    QualityKernels.margin(input.asInstanceOf[UTF8String], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("qcWeights", weights, "long[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.QualityKernels.margin($in, $w)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "hashed_margin"
}

object QualityKernels {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** lower → tokenize → md5-bucket → Σ weights, all exact int64.
    * `weights.length` IS the hash dimension. */
  def margin(text: UTF8String, weights: Array[Long]): Long = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val dim = weights.length
    val md = digest.get()
    var sum = 0L
    var i = 0
    while (i < len) {
      if (isAsciiSpace(bytes(i))) i += 1
      else {
        val start = i
        while (i < len && !isAsciiSpace(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        sum += weights((h % dim).toInt)
      }
    }
    sum
  }
}
