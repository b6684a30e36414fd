package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row tokenizer kernels (static methods so codegen can call
  * them directly, same pattern as [[SketchKernels]]). */
object TokenizeKernels {

  /** Viterbi segmentation of one word under a unigram piece model.
    *
    * DP over end positions with PROBABILITY PRODUCTS, not log sums:
    * `dp(k) = max over j in [k-maxLen, k) of dp(j) * p(word[j..k))`,
    * ties broken toward the SMALLEST j (iterate j ascending, strict
    * improvement only). IEEE multiply and divide are correctly rounded,
    * so a fixed evaluation order makes every dp value — and therefore
    * every comparison — bit-identical to the DuckDB oracle's replay of
    * the same recurrence; `ln`-based scoring would not be (libm logs
    * differ in the last ulp across engines — the LmScore.avg_logp
    * precedent). Underflow is not reachable at the supported word
    * lengths (p ≥ 1/N per piece, ≤ maxWordLen factors).
    *
    * Returns null when no segmentation exists (a character outside the
    * vocab); the trainer's coverage floor re-seeds every corpus
    * character each round, so this only happens for out-of-domain input.
    */
  def viterbi(word: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Double],
      maxPieceLen: Int): ArrayData = {
    // DP over CODE POINTS, not UTF-16 units: the trainer's seed
    // (Column.substr), its length filters, and the DuckDB oracle all
    // count code points — a UTF-16 window would make a piece spanning a
    // supplementary character unreachable here while the oracle can
    // still pick it (self-review catch).
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val dp = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    java.util.Arrays.fill(back, -1)
    dp(0) = 1.0
    back(0) = 0
    var k = 1
    while (k <= n) {
      var j = math.max(0, k - maxPieceLen)
      while (j < k) {
        if (back(j) >= 0) {
          val p = vocab.get(new String(cps, j, k - j))
          if (p != null) {
            val cand = dp(j) * p.doubleValue()
            if (back(k) < 0 || cand > dp(k)) { dp(k) = cand; back(k) = j }
          }
        }
        j += 1
      }
      k += 1
    }
    if (back(n) < 0) return null
    var cnt = 0
    var at = n
    while (at > 0) { cnt += 1; at = back(at) }
    val out = new Array[Any](cnt)
    at = n
    var idx = cnt - 1
    while (at > 0) {
      val j = back(at)
      out(idx) = UTF8String.fromString(new String(cps, j, at - j))
      idx -= 1
      at = j
    }
    new GenericArrayData(out)
  }
}

/** Companion greedy kernel — see [[TokenizeKernels.viterbi]] for the
  * code-point rationale shared by both. */
object MaxMatchKernel {
  /** Greedy longest-match-first (MaxMatch) segmentation — WordPiece
    * INFERENCE (Song et al. EMNLP '21 describe the linear variant; this
    * is the textbook quadratic scan, fine at word lengths). At each
    * position take the LONGEST vocab piece that matches; if none
    * matches, the whole word maps to the single `unk` piece (standard
    * WordPiece failure semantics). Deterministic — no scores at all, so
    * the oracle replay is pure set membership. */
  def maxMatch(word: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int, unk: UTF8String): ArrayData = {
    val cps = word.toString.codePoints().toArray
    val n = cps.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any]()
    var pos = 0
    while (pos < n) {
      var l = math.min(maxPieceLen, n - pos)
      var matched = -1
      while (l >= 1 && matched < 0) {
        if (vocab.contains(new String(cps, pos, l))) matched = l
        l -= 1
      }
      if (matched < 0)
        return new GenericArrayData(Array[Any](unk))
      out.add(UTF8String.fromString(new String(cps, pos, matched)))
      pos += matched
    }
    new GenericArrayData(out.toArray)
  }
}

/** [[MaxMatchKernel.maxMatch]] as a codegen'd Catalyst expression. */
case class MaxMatchSegment(child: Expression, vocab: Seq[String],
    maxPieceLen: Int, unk: String) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"max_match_segment expects string, got $other")
  }

  @transient private lazy val vset: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val unkU = UTF8String.fromString(unk)

  override protected def nullSafeEval(input: Any): Any =
    MaxMatchKernel.maxMatch(input.asInstanceOf[UTF8String], vset,
      maxPieceLen, unkU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", vset, "java.util.HashSet")
    val unkRef = ctx.addReferenceObj("unk", unkU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.MaxMatchKernel.maxMatch($in, $ref, $maxPieceLen, $unkRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "max_match_segment"
}

/** [[TokenizeKernels.viterbi]] as a codegen'd Catalyst expression; the
  * piece model rides along as a reference object (same shape as
  * [[SignBands]]' plane matrix). */
case class ViterbiSegment(child: Expression, vocab: Map[String, Double],
    maxPieceLen: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"viterbi_segment expects string, got $other")
  }

  @transient private lazy val vmap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocab.size * 2)
    vocab.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    TokenizeKernels.viterbi(input.asInstanceOf[UTF8String], vmap, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocab", vmap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, in => {
      s"""${ev.value} = graft.functions.TokenizeKernels.viterbi($in, $ref, $maxPieceLen);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "viterbi_segment"
}
