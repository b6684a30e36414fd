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

/** Banded blocking keys for winnowed copy detection: the document's
  * POSITIONAL winnow sequence (window minima in text order, consecutive
  * duplicates collapsed), taken as adjacent pairs and encoded
  * `h1 * Mod + h2` (both < 2^30, so the product fits a long losslessly).
  *
  * Blocking on a pair of consecutive fingerprints instead of one
  * SQUARES the selectivity: a bucket key now needs a shared ~k+w·2-char
  * passage, which de-ubiquitizes low-entropy corpora where single
  * k-grams blanket every document (the measured q_fingerprint_overlap
  * blowup, BASELINE.md round-5). Recall provably drops only for copied
  * passages shorter than two winnow windows — those never produce two
  * consecutive shared minima. */
case class WinnowPairKeys(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "winnow needs k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_pair_keys expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.computePairs(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.WinnowFingerprints.computePairs($in, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "winnow_pair_keys"
}

/** POSITIONAL winnow selection: the distinct (gram position, hash)
  * pairs the winnow actually selects, 1-based code-point positions in
  * ascending order — the gram source of the winnowed exact-substring
  * dedup tier ([[graft.operators.Dedup.winnowSubstrDedup]]), which
  * needs positions to merge flagged grams into removable char spans.
  * [[WinnowFingerprints]] deliberately discards positions (set
  * semantics for overlap joins); this kernel keeps them.
  *
  * Tie rule (cross-engine pinned): each window selects its minimum
  * hash, ties broken by the RIGHTMOST position — the standard
  * winnowing tie rule, and exactly what the monotonic deque's `>=`
  * pop produces. The DuckDB oracle replays it by minimizing
  * `hash * 2^31 + (2^31 - pos)` per window (hash < 2^30, pos < 2^31:
  * lossless in one BIGINT; larger pos ⇒ smaller encoding ⇒ rightmost
  * wins equal hashes). Selection is LOCAL (window contents only), so
  * two documents sharing a ≥ k+w−1-char substring select identical
  * (relative position, hash) pairs inside it — the guarantee the
  * span-merge tier builds on. */
case class WinnowPositions(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, "winnow needs k >= 2, w >= 1")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("fp", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.computePositions(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.WinnowFingerprints.computePositions($in, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "winnow_positions"
}

object WinnowFingerprints {
  final val Base = 257L
  final val Mod = 1000000007L

  private val Empty = Array.empty[Long]

  /** Rolling k-gram Rabin–Karp hashes over the text's code points
    * (matching DuckDB unicode(substr(t, i, 1)) indexing); empty when the
    * text is shorter than k. */
  private def rollingHashes(text: UTF8String, k: Int): Array[Long] = {
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
    if (m <= 0) return Empty

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
    hashes
  }

  /** The positional winnow sequence: each window's minimum hash in text
    * order, CONSECUTIVE duplicates collapsed (the same monotonic-deque
    * minima [[compute]] selects, before set-dedup). */
  private def minimaSequence(hashes: Array[Long], w: Int): Array[Long] = {
    val m = hashes.length
    if (m == 0) return Empty
    if (m <= w) {
      var min = hashes(0)
      var i = 1
      while (i < m) { if (hashes(i) < min) min = hashes(i); i += 1 }
      return Array(min)
    }
    val seq = new Array[Long](m)
    var sl = 0
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = hashes(deque(head))
        if (sl == 0 || seq(sl - 1) != v) { seq(sl) = v; sl += 1 }
      }
      i += 1
    }
    java.util.Arrays.copyOf(seq, sl)
  }

  private def toSortedDistinctArrayData(vs: Array[Long]): GenericArrayData = {
    val set = new java.util.HashSet[Long](vs.length * 2 + 8)
    var i = 0
    while (i < vs.length) { set.add(vs(i)); i += 1 }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out.map(v => v: Any))
  }

  /** Static helper (NOT named `eval` — see TextStatsKernel's codegen
    * note): rolling k-gram hashes + deque window minima + distinct sort. */
  def compute(text: UTF8String, k: Int, w: Int): GenericArrayData =
    toSortedDistinctArrayData(minimaSequence(rollingHashes(text, k), w))

  /** [[WinnowPositions]]' helper: distinct selected (1-based position,
    * hash) structs in ascending position order. Same deque as
    * [[minimaSequence]] (min per window, rightmost tie) but keeping the
    * selected INDEX; the head index is non-decreasing across windows,
    * so last-value dedup yields a sorted distinct position list. */
  def computePositions(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hashes = rollingHashes(text, k)
    val m = hashes.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    val sel = new Array[Int](m)
    var sl = 0
    if (m <= w) {
      // a document shorter than one full window is ONE window: the
      // rightmost minimal gram of the whole sequence is selected
      var best = 0
      var i = 1
      while (i < m) { if (hashes(i) <= hashes(best)) best = i; i += 1 }
      sel(0) = best; sl = 1
    } else {
      val deque = new Array[Int](m)
      var head = 0
      var tail = 0 // exclusive
      var i = 0
      while (i < m) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
        deque(tail) = i; tail += 1
        if (deque(head) <= i - w) head += 1
        if (i >= w - 1) {
          val p = deque(head)
          if (sl == 0 || sel(sl - 1) != p) { sel(sl) = p; sl += 1 }
        }
        i += 1
      }
    }
    val out = new Array[Any](sl)
    var j = 0
    while (j < sl) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](sel(j) + 1, hashes(sel(j))))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted distinct `h1 * Mod + h2` keys over ADJACENT entries of the
    * positional winnow sequence — the band-of-2 blocking keys
    * ([[WinnowPairKeys]]). Documents shorter than two windows yield an
    * empty key set. */
  def computePairs(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val seq = minimaSequence(rollingHashes(text, k), w)
    if (seq.length < 2) return new GenericArrayData(Array.empty[Any])
    val pairs = new Array[Long](seq.length - 1)
    var i = 0
    while (i < seq.length - 1) {
      pairs(i) = seq(i) * Mod + seq(i + 1)
      i += 1
    }
    toSortedDistinctArrayData(pairs)
  }
}
