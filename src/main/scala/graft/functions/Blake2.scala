package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BLAKE2 (RFC 7693) — closes the `digest(x, 'blake2b'/'blake2s')` gap:
  * DataFusion's digest supports the BLAKE2 family, but no public
  * implementation ships on this classpath, so the rounds are implemented
  * here from the RFC. Unkeyed, full-length digests (BLAKE2b-512 /
  * BLAKE2s-256), hex-string output like Spark's own md5/sha2.
  * Verified against the RFC appendix test vectors in DFCompatSpec. */
object Blake2Kernels {

  private val IV64 = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val IV32 = Array(
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  private val SIGMA = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0),
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3))

  @inline private def rotr64(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))
  @inline private def rotr32(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  private def g64(v: Array[Long], a: Int, b: Int, c: Int, d: Int,
      x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr64(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr64(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 63)
  }

  private def g32(v: Array[Int], a: Int, b: Int, c: Int, d: Int,
      x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr32(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr32(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = rotr32(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = rotr32(v(b) ^ v(c), 7)
  }

  private def compressB(h: Array[Long], m: Array[Byte], off: Int, t: Long,
      last: Boolean): Unit = {
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV64, 0, v, 8, 8)
    v(12) ^= t // messages < 2^64 bytes: high counter word stays 0
    if (last) v(14) = ~v(14)
    val msg = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 0
      while (j < 8) { w |= (m(off + i * 8 + j) & 0xffL) << (8 * j); j += 1 }
      msg(i) = w
      i += 1
    }
    var r = 0
    while (r < 12) {
      val s = SIGMA(r)
      g64(v, 0, 4, 8, 12, msg(s(0)), msg(s(1)))
      g64(v, 1, 5, 9, 13, msg(s(2)), msg(s(3)))
      g64(v, 2, 6, 10, 14, msg(s(4)), msg(s(5)))
      g64(v, 3, 7, 11, 15, msg(s(6)), msg(s(7)))
      g64(v, 0, 5, 10, 15, msg(s(8)), msg(s(9)))
      g64(v, 1, 6, 11, 12, msg(s(10)), msg(s(11)))
      g64(v, 2, 7, 8, 13, msg(s(12)), msg(s(13)))
      g64(v, 3, 4, 9, 14, msg(s(14)), msg(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  private def compressS(h: Array[Int], m: Array[Byte], off: Int, t: Long,
      last: Boolean): Unit = {
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV32, 0, v, 8, 8)
    v(12) ^= t.toInt
    v(13) ^= (t >>> 32).toInt
    if (last) v(14) = ~v(14)
    val msg = new Array[Int](16)
    var i = 0
    while (i < 16) {
      var w = 0
      var j = 0
      while (j < 4) { w |= (m(off + i * 4 + j) & 0xff) << (8 * j); j += 1 }
      msg(i) = w
      i += 1
    }
    var r = 0
    while (r < 10) { // BLAKE2s: 10 rounds
      val s = SIGMA(r)
      g32(v, 0, 4, 8, 12, msg(s(0)), msg(s(1)))
      g32(v, 1, 5, 9, 13, msg(s(2)), msg(s(3)))
      g32(v, 2, 6, 10, 14, msg(s(4)), msg(s(5)))
      g32(v, 3, 7, 11, 15, msg(s(6)), msg(s(7)))
      g32(v, 0, 5, 10, 15, msg(s(8)), msg(s(9)))
      g32(v, 1, 6, 11, 12, msg(s(10)), msg(s(11)))
      g32(v, 2, 7, 8, 13, msg(s(12)), msg(s(13)))
      g32(v, 3, 4, 9, 14, msg(s(14)), msg(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** BLAKE2b, unkeyed, `outLen` bytes (<= 64). */
  def blake2b(input: Array[Byte], outLen: Int): Array[Byte] = {
    val h = IV64.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong
    val n = input.length
    var off = 0
    var t = 0L
    while (n - off > 128) {
      t += 128
      compressB(h, input, off, t, last = false)
      off += 128
    }
    val fin = new Array[Byte](128)
    System.arraycopy(input, off, fin, 0, n - off)
    t += (n - off)
    compressB(h, fin, 0, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte; i += 1 }
    out
  }

  /** BLAKE2s, unkeyed, `outLen` bytes (<= 32). */
  def blake2s(input: Array[Byte], outLen: Int): Array[Byte] = {
    val h = IV32.clone()
    h(0) ^= 0x01010000 ^ outLen
    val n = input.length
    var off = 0
    var t = 0L
    while (n - off > 64) {
      t += 64
      compressS(h, input, off, t, last = false)
      off += 64
    }
    val fin = new Array[Byte](64)
    System.arraycopy(input, off, fin, 0, n - off)
    t += (n - off)
    compressS(h, fin, 0, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) { out(i) = (h(i / 4) >>> (8 * (i % 4))).toByte; i += 1 }
    out
  }

  private def hex(bytes: Array[Byte]): UTF8String = {
    val sb = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(sb.toString)
  }

  /** Codegen entry points (hex-string output like Spark's md5/sha2). */
  def blake2bHex(input: Array[Byte]): UTF8String = hex(blake2b(input, 64))
  def blake2sHex(input: Array[Byte]): UTF8String = hex(blake2s(input, 32))
}

/** `digest(x, 'blake2b' | 'blake2s')` expression: full-length unkeyed
  * digest, hex string out. */
case class Blake2(child: Expression, wide: Boolean) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"blake2 expects binary input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    if (wide) Blake2Kernels.blake2bHex(input.asInstanceOf[Array[Byte]])
    else Blake2Kernels.blake2sHex(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.Blake2Kernels.blake2${if (wide) "b" else "s"}Hex($in)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = if (wide) "blake2b" else "blake2s"
}
