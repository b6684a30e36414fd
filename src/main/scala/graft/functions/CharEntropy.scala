package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character distribution profile:
  * (n_chars, distinct_chars, char_entropy) — the Shannon entropy
  * gibberish/boilerplate signal a curation pipeline thresholds on
  * (natural language sits ~3.5-4.5 bits/char; base64 blobs and
  * key-mash spam sit far higher, template repetition far lower).
  *
  * Counting is per Unicode CODEPOINT — the same unit DuckDB's
  * `string_split_regex(text, '')` + `entropy(c)` aggregate replay in
  * the oracle; entropy is the plain −Σ p·log2(p) over the counts.
  * n_chars/distinct_chars are exact integers; the entropy double's
  * last-ulp summation drift vs the oracle's accumulation order is
  * inside the driver hash's 1e-9 relative tolerance (the value is a
  * reported SIGNAL — per the FIXTURES.md rule it must never pick rows
  * or set ranks cross-engine).
  *
  * One tight loop per row inside whole-stage codegen (the declarative
  * form would explode |text| single-char rows through a shuffle per
  * document — this is a shuffle-free projection; the reference engine
  * has no text surface, lib.rs:678).
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("distinct_chars", LongType, nullable = false),
    StructField("char_entropy", DoubleType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.CharEntropy.compute($in)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  private val Log2 = Math.log(2.0)

  // The helper must NOT be named `eval` (the case class inherits one).
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    val len = str.length
    // codepoint counts: dense array for ASCII (the hot path), map
    // beyond. The non-ASCII map MUST iterate in a permutation-invariant
    // order (sorted keys): a HashMap's collision chains order by
    // INSERTION, so two anagram strings could sum the entropy terms in
    // different orders and differ by an ULP — caught as a rare
    // ScalaCheck flake in the "permutation-invariant (exactly)"
    // property (round 11). Entropy of a bag must not depend on the
    // order the bag was written in.
    val ascii = new Array[Int](128)
    var other: java.util.TreeMap[Integer, Integer] = null
    var n = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.TreeMap[Integer, Integer]()
        other.merge(cp, 1, (a, b) => a + b)
      }
      n += 1
      i += Character.charCount(cp)
    }
    var distinct = 0L
    var h = 0.0
    var c = 0
    while (c < 128) {
      val cnt = ascii(c)
      if (cnt > 0) {
        distinct += 1
        val p = cnt.toDouble / n
        h -= p * (Math.log(p) / Log2)
      }
      c += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        distinct += 1
        val p = it.next().toDouble / n
        h -= p * (Math.log(p) / Log2)
      }
    }
    if (n == 0L) new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    else new GenericInternalRow(Array[Any](n, distinct, h))
  }
}
