package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD '03:
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * scheme): Rabin–Karp rolling hashes over every k-char gram, then the
  * minimum hash of each window of `w` consecutive grams. Guarantees every
  * shared substring of length ≥ k + w − 1 contributes at least one shared
  * fingerprint, at ~1/w the density of the full k-gram set.
  *
  * This is the brief's "document fingerprinting (rolling hash)" operator:
  * unlike [[TextStatsKernel]]'s whole-document md5-wordset fingerprint
  * (exact-dup key), winnowed fingerprints are LOCAL — two documents
  * sharing a long passage share fingerprints even when the rest differs —
  * so the exploded (doc, fp) relation doubles as a blocking key for
  * copy-detection joins ([[graft.operators.Fingerprint.overlapPairs]]).
  *
  * Cross-engine exactness (the DuckDB oracle replays the same math):
  * hashes are Σ cp[i+j]·B^(k−1−j) mod P over Unicode code points with
  * B=257, P=1e9+7 — pure int64 arithmetic, no float. The kernel computes
  * them rolling (one multiply-add per char) and takes window minima with a
  * monotonic deque: O(n) per document, not O(n·k + n·w). Output is the
  * sorted distinct fingerprint set (selection dedups; ordering makes the
  * array hash-stable).
  *
  * Reference behavior anchor: dashbook's engine exposes document
  * fingerprinting only via its hash functions (lib.rs registers the digest
  * family); winnowing is the published local-fingerprint scheme a corpus
  * pipeline needs at 100 TB, built Spark-first as a codegen kernel.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "winnow needs k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.WinnowFingerprints.compute($in, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFingerprints {
  final val Base = 257L
  final val Mod = 1000000007L

  /** Static helper (NOT named `eval` — see TextStatsKernel's codegen
    * note): rolling k-gram hashes + deque window minima + distinct sort. */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    // Code points, matching DuckDB unicode(substr(t, i, 1)) indexing.
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < s.length) {
      val cp = s.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    val m = n - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])

    // pw = B^(k-1) mod P for the rolling drop term.
    var pwTop = 1L
    var e = 0
    while (e < k - 1) { pwTop = pwTop * Base % Mod; e += 1 }

    val hashes = new Array[Long](m)
    var h = 0L
    var i = 0
    while (i < k) { h = (h * Base + cps(i)) % Mod; i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * pwTop % Mod + Mod) * Base + cps(i + k - 1)) % Mod
      hashes(i) = h
      i += 1
    }

    val selected = new java.util.HashSet[Long](m / w + 8)
    if (m <= w) {
      var min = hashes(0)
      i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      selected.add(min)
    } else {
      // Monotonic deque of indices with increasing hash values.
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      i = 0
      while (i < m) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) selected.add(hashes(deque(head)))
        i += 1
      }
    }
    val out = new Array[Long](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out.map(v => v: Any))
  }
}
