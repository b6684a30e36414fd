package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-stats kernel over the RAW document text.
  *
  * The declarative formulation tokenized with a regex split, then walked
  * the words array ~10 more times — five `filter(_.isInCollection(...))`
  * stopword scans, two `array_distinct`, one `aggregate`, plus a second
  * regex pass for the punctuation ratio — all as INTERPRETED lambda trees
  * (higher-order-function lambdas never reach codegen). This expression
  * does tokenize + counts + punct in one tight loop and returns a struct;
  * downstream ratio/score math stays scalar codegen.
  *
  * Bit-identical to the declarative metrics by construction:
  *  - tokens = runs of non-`\s` after `UTF8String.toLowerCase` — the same
  *    result set as `filter(split(lower(text), "\\s+"), _ != "")` (Java's
  *    `\s` is the 6 ASCII whitespace chars; multi-byte UTF-8 never
  *    collides with ASCII bytes);
  *  - the distinct set uses the same binary UTF8 equality as
  *    `array_distinct`, and `joined` reproduces
  *    `array_join(sort_array(array_distinct(ws)), " ")` via the same
  *    binary ordering (`UTF8String.compareTo`);
  *  - `punct` counts bytes in `.,;:!?` — equal to
  *    `length(regexp_replace(text, "[^.,;:!?]", ""))` because those are
  *    single-byte chars and UTF-8 continuation bytes are ≥ 0x80.
  */
case class TextStatsKernel(child: Expression, stopLists: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_len", LongType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("hits", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("joined", StringType, nullable = false),
    StructField("punct", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats expects string, got $other")
  }

  @transient private lazy val stopSets: Array[java.util.HashSet[UTF8String]] =
    stopLists.map { ls =>
      val s = new java.util.HashSet[UTF8String](ls.size * 2)
      ls.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any =
    TextStatsKernel.compute(input.asInstanceOf[UTF8String], stopSets)

  // The helper must NOT be named `eval`: the case class inherits
  // Expression.eval(InternalRow), which suppresses the companion's static
  // forwarder, so Janino resolves `TextStatsKernel.eval(...)` against the
  // instance methods and the whole stage silently falls back to
  // interpreted mode (the CompileException stack in BENCH_r04's tail).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setsRef = ctx.addReferenceObj("stopSets", stopSets,
      "java.util.HashSet[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.TextStatsKernel.compute($in, $setsRef)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "text_stats"
}

object TextStatsKernel {
  private def isWs(b: Byte): Boolean = // Java regex \s — ASCII only
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def isPunct(b: Byte): Boolean =
    b == '.' || b == ',' || b == ';' || b == ':' || b == '!' || b == '?'

  def compute(text: UTF8String, stopSets: Array[java.util.HashSet[UTF8String]]): InternalRow = {
    val lowered = text.toLowerCase
    val bytes = lowered.getBytes // copy only when offheap/offset != 0
    var punct = 0
    var nTokens = 0
    var sumLen = 0L
    val hits = new Array[Int](stopSets.length)
    val distinct = new java.util.HashSet[UTF8String](64)
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isWs(bytes(i))) i += 1
      else {
        var j = i
        while (j < n && !isWs(bytes(j))) {
          if (isPunct(bytes(j))) punct += 1
          j += 1
        }
        val w = UTF8String.fromBytes(bytes, i, j - i)
        nTokens += 1
        sumLen += w.numChars()
        distinct.add(w)
        var s = 0
        while (s < stopSets.length) {
          if (stopSets(s).contains(w)) hits(s) += 1
          s += 1
        }
        i = j
      }
    }
    val sorted = distinct.toArray(new Array[UTF8String](distinct.size))
    java.util.Arrays.sort(sorted, null) // natural order = binary UTF8 order
    val joined = UTF8String.concatWs(UTF8String.fromString(" "), sorted: _*)
    new GenericInternalRow(Array[Any](
      nTokens, sumLen, distinct.size(),
      new GenericArrayData(hits.map(h => h: Any)), joined, punct))
  }
}
