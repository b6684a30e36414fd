package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Normalized character n-grams in ONE pass — the language-ID feature
  * extractor ([[graft.operators.LangId]]) as a codegen kernel.
  *
  * Value-identical by construction to the declarative chain
  * `transform(sequence(1, greatest(length(t)-(n-1), 1)), i -> substr(t, i, n))`
  * over `t = concat(' ', regexp_replace(lower(text), "\\s+", " "), ' ')`
  * (which the DuckDB oracle replays verbatim):
  *  - lowercase is `UTF8String.toLowerCase` — exactly Spark's `lower()`;
  *  - Java's `\s` is the six ASCII whitespace bytes, and UTF-8
  *    continuation bytes are ≥ 0x80, so run collapsing can work
  *    byte-wise: each maximal ASCII-whitespace run becomes one 0x20,
  *    runs at the ends collapse but are NOT trimmed, then one pad
  *    space is added on each side;
  *  - grams are CHAR-based (`substr` semantics): the kernel records
  *    UTF-8 lead-byte boundaries and slices `max(N-(n-1), 1)` windows,
  *    the last ones clipped at the end — a sub-n-char input yields the
  *    single clipped gram the declarative form yields.
  *
  * Why a kernel: higher-order-function lambdas run interpreted, so the
  * declarative form paid sequence materialization + per-element lambda
  * dispatch + boxing for every one of the ~|text| grams of every
  * document — the hot loop of the whole operator (STATUS round-10
  * invariant: hot per-element loops are kernel expressions). */
case class CharGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "gram width must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_grams expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangKernels.normGrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.LangKernels.normGrams($in, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "char_grams"
}

/** Order-preserving DISTINCT word n-gram shingles in ONE pass — the
  * MinHash/n-gram-Jaccard feature extractor ([[graft.operators.Dedup]])
  * as a codegen kernel. Value-identical to the declarative
  * `array_distinct(transform(sequence(1, greatest(size(ws)-(n-1), 1)),
  * i -> array_join(slice(ws, i, n), " ")))` over
  * `ws = filter(split(lower(text), "\\s+"), _ != "")` that the DuckDB
  * oracles replay: same tokenizer (runs of non-`\s` after
  * `UTF8String.toLowerCase` — a leading-whitespace split's empty first
  * element is the filtered ""), same single-space joining, same
  * first-occurrence distinct order, and the same degenerate results
  * (no tokens → [""], fewer than n tokens → one clipped shingle).
  * Same motivation as [[CharGrams]]: the HOF chain ran interpreted,
  * ~|words| lambda dispatches + slice/join allocations per document,
  * in the benched flagship path. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be positive")

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    LangKernels.shingleSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.LangKernels.shingleSet($in, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "word_shingles"
}

object LangKernels {

  private def isAsciiSpace(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** lower → collapse `\s+` runs to single spaces → pad → char n-grams. */
  def normGrams(text: UTF8String, n: Int): GenericArrayData = {
    val lower = text.toLowerCase.getBytes
    // normalized bytes: leading pad, run-collapsed body, trailing pad
    val norm = new Array[Byte](lower.length + 2)
    norm(0) = 0x20
    var w = 1
    var i = 0
    while (i < lower.length) {
      val b = lower(i)
      if (isAsciiSpace(b)) {
        norm(w) = 0x20; w += 1
        i += 1
        while (i < lower.length && isAsciiSpace(lower(i))) i += 1
      } else {
        norm(w) = b; w += 1
        i += 1
      }
    }
    norm(w) = 0x20; w += 1
    // char start offsets (UTF-8 lead bytes: everything but 10xxxxxx)
    val starts = new Array[Int](w)
    var chars = 0
    i = 0
    while (i < w) {
      if ((norm(i) & 0xc0) != 0x80) { starts(chars) = i; chars += 1 }
      i += 1
    }
    val count = math.max(chars - (n - 1), 1)
    val out = new Array[AnyRef](count)
    var g = 0
    while (g < count) {
      val from = starts(g)
      val until = if (g + n < chars) starts(g + n) else w
      out(g) = UTF8String.fromBytes(norm, from, until - from)
      g += 1
    }
    new GenericArrayData(out)
  }

  /** lower → tokenize (runs of non-ASCII-whitespace) → n-word shingles
    * joined by single spaces → first-occurrence-order distinct. */
  def shingleSet(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // pass 1: count tokens; pass 2: record [start, end) offsets
    var nTok = 0
    var i = 0
    while (i < len) {
      if (isAsciiSpace(bytes(i))) i += 1
      else { nTok += 1; while (i < len && !isAsciiSpace(bytes(i))) i += 1 }
    }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    i = 0
    while (i < len) {
      if (isAsciiSpace(bytes(i))) i += 1
      else {
        starts(t) = i
        while (i < len && !isAsciiSpace(bytes(i))) i += 1
        ends(t) = i; t += 1
      }
    }
    val count = math.max(nTok - (n - 1), 1)
    val out = new java.util.LinkedHashSet[UTF8String](count * 2)
    var g = 0
    while (g < count) {
      val hi = math.min(g + n, nTok)
      var blen = 0
      t = g
      while (t < hi) { blen += ends(t) - starts(t); t += 1 }
      if (hi > g) blen += hi - g - 1 // single-space separators
      val buf = new Array[Byte](math.max(blen, 0))
      var w = 0
      t = g
      while (t < hi) {
        if (t > g) { buf(w) = 0x20; w += 1 }
        val l = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), buf, w, l)
        w += l; t += 1
      }
      out.add(UTF8String.fromBytes(buf))
      g += 1
    }
    new GenericArrayData(out.toArray(new Array[AnyRef](out.size)))
  }
}
