package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min sketch over a string column — one-pass frequency
  * estimation with O(depth × width) state and NO per-term shuffle (the
  * reference reaches frequency queries only through DataFusion's exact
  * GROUP BY, lib.rs:678; at 100 TB the exact path shuffles the whole
  * vocabulary, this sketch shuffles one counter matrix per partition).
  *
  * Counters are exact integer sums, so partials merge associatively and
  * the final matrix is INDEPENDENT of partitioning and row order — which
  * also makes it cross-engine replayable: bucket `i` of a term is the
  * i-th 8-hex-char slice of md5(term) mod width, the same value DuckDB
  * computes from `substr(md5(term), 8*i+1, 8)` (the md5-hex recipe the
  * SimHash oracle established). Estimate = min over rows of the hit
  * counters; the classic CMS guarantee (estimate ≥ true count, within
  * ε·N with probability 1−δ at width=e/ε, depth=ln 1/δ) holds per
  * Cormode & Muthukrishnan 2005.
  *
  * depth ≤ 4 because md5 yields 32 hex chars = four independent 32-bit
  * slices; width is the modulus. Output: flat row-major
  * `array<long>` of depth × width counters.
  */
case class CountMinSketch(
    child: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 4,
    s"count_min_sketch: depth must be 1..4 (md5 has 4 32-bit slices), got $depth")
  require(width >= 2, s"count_min_sketch: width must be >= 2, got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min_sketch expects a string column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val digest = CountMinSketch.md5(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < depth) {
        buf(i * width + CountMinSketch.bucket(digest, i, width)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): Expression = copy(child = cs.head)
  override def prettyName: String = "count_min_sketch"
}

object CountMinSketch {

  private val tlDigest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def md5(bytes: Array[Byte]): Array[Byte] = {
    val d = tlDigest.get()
    d.reset()
    d.digest(bytes)
  }

  /** Bucket i = big-endian uint32 of digest bytes [4i, 4i+4) mod width —
    * bit-identical to `conv(substring(md5(term), 8*i+1, 8), 16, 10) %
    * width` on the hex rendering (hex char pairs ARE the bytes). */
  def bucket(digest: Array[Byte], i: Int, width: Int): Int = {
    val u = ((digest(4 * i) & 0xffL) << 24) |
      ((digest(4 * i + 1) & 0xffL) << 16) |
      ((digest(4 * i + 2) & 0xffL) << 8) |
      (digest(4 * i + 3) & 0xffL)
    (u % width).toInt
  }
}
