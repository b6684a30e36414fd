package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Sketch kernels for the dedup operators.
  *
  * The declarative `transform(perms, p -> array_min(transform(hashes, …)))`
  * formulation is correct but runs as interpreted lambda trees —
  * O(numPerms × shingles) boxed evaluations per document, which measured
  * ~100× slower than necessary at sf0.1. These expressions compute the
  * same signatures in one tight JIT'd loop per row, and plug into
  * whole-stage codegen via a static call, so the scan → signature → band
  * pipeline stays a single codegen stage. Semantics are identical to the
  * declarative version (same seeds, same prime).
  */
object SketchKernels {
  /** (a*h + b) mod P per permutation, min over shingle hashes. */
  def minhash(hs: ArrayData, as: Array[Long], bs: Array[Long],
      prime: Long): ArrayData = {
    val k = as.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var p = 0
      while (p < k) {
        val v = (as(p) * h + bs(p)) % prime
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    if (n == 0) java.util.Arrays.fill(sig, 0L)
    new GenericArrayData(sig)
  }

  /** Sequential-order cosine: dot and both norms in one pass. */
  def cosine(a: ArrayData, aDouble: Boolean, b: ArrayData,
      bDouble: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Sequential-order dot product (same accumulation order as [[cosine]]'s
    * dot term — bit-identical when divided by precomputed norms). */
  def dot(a: ArrayData, aDouble: Boolean, b: ArrayData, bDouble: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  /** sqrt of the sequential self-dot — the norm term of [[cosine]]. */
  def norm(a: ArrayData, aDouble: Boolean): Double =
    math.sqrt(dot(a, aDouble, a, aDouble))

  /** Index of the max-inner-product centroid (first index wins ties —
    * strict `>` keeps the earliest max, matching the CASE-order tie rule
    * of the declarative form it replaces). One pass over the vector per
    * centroid; each per-element product is the same x*c double op as
    * [[dot]], so the chosen cell is identical to comparing greatest()
    * over individual dot_product columns. */
  def argMaxDot(v: ArrayData, vDouble: Boolean,
      cents: Array[Array[Double]]): Int = {
    var best = Double.NegativeInfinity
    var bestI = -1
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val n = math.min(v.numElements(), cent.length)
      var s = 0.0
      var i = 0
      while (i < n) {
        val x = if (vDouble) v.getDouble(i) else v.getFloat(i).toDouble
        s += x * cent(i)
        i += 1
      }
      if (s > best) { best = s; bestI = c }
      c += 1
    }
    bestI
  }

  /** Per-band sign-LSH keys over constant hyperplanes: bit i of band b's
    * key is set iff dot(v, planes[b*per+i]) > 0. Each plane dot uses the
    * same sequential ascending-index double accumulation as [[dot]], so
    * keys are bit-identical to summing `CASE WHEN dot_product(v, p) > 0`
    * columns (the declarative form this replaces evaluated bands×per
    * separate kernel calls — 64 expression nodes and 64 vector
    * traversals per row for the 8×8 default). */
  def signBands(v: ArrayData, vDouble: Boolean, planes: Array[Array[Double]],
      bands: Int): ArrayData = {
    val per = planes.length / bands
    val out = new Array[Long](bands)
    var b = 0
    var p = 0
    while (b < bands) {
      var key = 0L
      var i = 0
      while (i < per) {
        val plane = planes(p)
        val n = math.min(v.numElements(), plane.length)
        var s = 0.0
        var j = 0
        while (j < n) {
          val x = if (vDouble) v.getDouble(j) else v.getFloat(j).toDouble
          s += x * plane(j)
          j += 1
        }
        if (s > 0) key |= (1L << i)
        i += 1; p += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  /** LSH band keys from a minhash signature: one 64-bit key per band,
    * mixing the band's r signature values with an avalanche hash. Keys
    * only need to collide iff the r-value slices are equal — they bucket
    * candidates, they're not compared cross-engine — so hashing the raw
    * longs replaces the interpreted slice→stringify→concat→xxhash chain. */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    var i = 0
    while (b < bands) {
      var h = -7046029254386353131L // xxhash64 prime seed
      var j = 0
      while (j < r) {
        h = java.lang.Long.rotateLeft(h ^ (sig.getLong(i) * -4417276706812531889L), 27)
        h = h * -7046029254386353131L + 0x165667b19e3779f9L
        i += 1; j += 1
      }
      h ^= h >>> 33; h *= -4417276706812531889L; h ^= h >>> 29
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash 16-bit band keys: 4 keys, bit j set iff component > 0 —
    * value-identical to the declarative Σ 2^j formulation it replaces. */
  def simhashBands(sv: ArrayData): ArrayData = {
    val out = new Array[Long](4)
    var b = 0
    while (b < 4) {
      var key = 0L
      var j = 0
      while (j < 16) {
        if (sv.getLong(b * 16 + j) > 0) key |= (1L << j)
        j += 1
      }
      out(b) = key
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming distance between two sign vectors: count of positions where
    * the component signs differ — value-identical to the
    * `size(filter(zip_with(a, b, (x,y) => (x>0) =!= (y>0)), identity))`
    * HOF form it replaces (which ran as interpreted lambdas in the
    * simhash verify stage). */
  def hammingSigns(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0
    var i = 0
    while (i < n) {
      if ((a.getLong(i) > 0) != (b.getLong(i) > 0)) d += 1
      i += 1
    }
    d
  }

  /** 64 signed bit-sum components over word hashes. */
  def simhash(hashes: ArrayData): ArrayData = {
    val acc = new Array[Long](64)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var b = 0
      while (b < 64) {
        acc(b) += (((h >>> b) & 1L) * 2L) - 1L
        b += 1
      }
      i += 1
    }
    new GenericArrayData(acc)
  }
}

abstract class LongArrayKernel extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects array<bigint>, got $other")
    }
}

/** MinHash signature over pre-hashed shingles (seeded, deterministic). */
case class MinHashSignature(child: Expression, numPerms: Int, prime: Long)
    extends LongArrayKernel {
  @transient private lazy val (as, bs) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(numPerms)(1L + rnd.nextInt(Int.MaxValue - 2).toLong),
      Array.fill(numPerms)(rnd.nextInt(Int.MaxValue - 1).toLong))
  }

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.minhash(input.asInstanceOf[ArrayData], as, bs, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.SketchKernels.minhash($in, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** Cosine similarity between two numeric arrays in one tight loop
  * (double accumulation in element order — bit-identical to the
  * sequential zip_with/aggregate formulation it replaces, which ran as
  * interpreted lambdas at ~100× the cost). */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.cosine(
      a.asInstanceOf[ArrayData],
      left.dataType.asInstanceOf[ArrayType].elementType == DoubleType,
      b.asInstanceOf[ArrayData],
      right.dataType.asInstanceOf[ArrayType].elementType == DoubleType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ld = left.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    val rd = right.dataType.asInstanceOf[ArrayType].elementType == DoubleType
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SketchKernels.cosine($a, $ld, $b, $rd)")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** Sequential dot product between two numeric arrays (pairs with
  * [[VecNorm]] so quadratic cosine probes compute each row's norm once,
  * not once per pair — bit-identical to [[CosineSim]] by construction). */
case class DotProduct(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects array<float|double>, got (${left.dataType}, ${right.dataType})")
  }

  private def isD(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.dot(a.asInstanceOf[ArrayData], isD(left),
      b.asInstanceOf[ArrayData], isD(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SketchKernels.dot($a, ${isD(left)}, $b, ${isD(right)})")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** Euclidean norm of a numeric array (sequential accumulation). */
case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vec_norm expects array<float|double>, got $other")
  }

  private def isD: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.norm(input.asInstanceOf[ArrayData], isD)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.SketchKernels.norm($in, $isD)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "vec_norm"
}

/** LSH band keys from a minhash signature (position = band index). */
case class BandKeys(child: Expression, bands: Int) extends LongArrayKernel {
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.bandKeys(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.SketchKernels.bandKeys($in, $bands)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "band_keys"
}

/** SimHash 4×16-bit band keys from the 64-component sign vector. */
case class SimHashBands(child: Expression) extends LongArrayKernel {
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.simhashBands(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.SketchKernels.simhashBands($in)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash_bands"
}

/** SimHash 64-component sign-sum vector over pre-hashed words. */
case class SimHashVector(child: Expression) extends LongArrayKernel {
  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in => s"graft.functions.SketchKernels.simhash($in)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash_vector"
}

/** Sign-vector Hamming distance — the simhash verify metric as one
  * kernel call, consistent with the other sketch kernels (the HOF form
  * never reaches codegen). */
case class HammingSigns(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming_signs expects array<bigint>, got (${left.dataType}, ${right.dataType})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SketchKernels.hammingSigns(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SketchKernels.hammingSigns($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_signs"
}

/** Sign-LSH band keys over constant hyperplanes (position = band index;
  * flat plane list consumed band-major, `planes.size / bands` per key). */
case class SignBands(child: Expression, planes: Seq[Seq[Double]], bands: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_bands expects array<float|double>, got $other")
  }

  @transient private lazy val ps: Array[Array[Double]] =
    planes.map(_.toArray).toArray
  private def isD: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.signBands(input.asInstanceOf[ArrayData], isD, ps, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", ps, "double[][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.SketchKernels.signBands($in, $isD, $ref, $bands)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "sign_bands"
}

/** argmax-inner-product cell assignment over constant centroids — the
  * IVF coarse quantizer as ONE kernel call (the declarative greatest +
  * CASE form evaluated every centroid dot twice: once inside greatest,
  * once per WHEN comparison). */
case class ArgMaxDot(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"arg_max_dot expects array<float|double>, got $other")
  }

  @transient private lazy val cents: Array[Array[Double]] =
    centroids.map(_.toArray).toArray
  private def isD: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override protected def nullSafeEval(input: Any): Any =
    SketchKernels.argMaxDot(input.asInstanceOf[ArrayData], isD, cents)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cents, "double[][]")
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.SketchKernels.argMaxDot($in, $isD, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "arg_max_dot"
}
