package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aggregation buffer: the running (min, max) of a string column.
  * UTF8Strings read off an UnsafeRow alias task-reused memory — always
  * [[UTF8String.clone]] before retaining. */
final class StringMinMaxBuffer {
  var mn: UTF8String = _
  var mx: UTF8String = _

  def add(v: UTF8String): Unit = {
    if (mn == null || v.compareTo(mn) < 0) mn = v.clone()
    if (mx == null || v.compareTo(mx) > 0) mx = v.clone()
  }

  def mergeFrom(o: StringMinMaxBuffer): Unit = {
    if (o.mn != null) { if (mn == null || o.mn.compareTo(mn) < 0) mn = o.mn }
    if (o.mx != null) { if (mx == null || o.mx.compareTo(mx) > 0) mx = o.mx }
  }
}

/** `string_min_max(expr)`: min and max of a string column in one
  * `struct(mn STRING, mx STRING)` aggregate.
  *
  * Exists for plan shape: Spark's builtin `min`/`max` over a string put
  * a var-width value in the aggregation buffer, which disqualifies
  * HashAggregate (buffers must be UnsafeRow-mutable) AND sort-aggregate
  * codegen — every profile-style aggregate that touches one string
  * column degrades to interpreted per-row updates for ALL its columns.
  * As a TypedImperativeAggregate this routes to ObjectHashAggregate
  * instead: updates are compiled `UTF8String.compareTo` calls, it
  * composes with other imperative aggs (HLL sketches) in the same
  * operator, and the corpus-side scan never plans a SortAggregate.
  * Null-safe: nulls are skipped; an all-null column yields (null, null).
  */
case class StringMinMax(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StringMinMaxBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("mn", StringType), StructField("mx", StringType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"string_min_max expects a string input, got $other")
  }

  override def createAggregationBuffer(): StringMinMaxBuffer =
    new StringMinMaxBuffer

  override def update(buf: StringMinMaxBuffer,
      input: InternalRow): StringMinMaxBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(b1: StringMinMaxBuffer,
      b2: StringMinMaxBuffer): StringMinMaxBuffer = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: StringMinMaxBuffer): Any = InternalRow(buf.mn, buf.mx)

  override def serialize(buf: StringMinMaxBuffer): Array[Byte] = {
    def bytes(s: UTF8String): Array[Byte] =
      if (s == null) null else s.getBytes
    val a = bytes(buf.mn)
    val b = bytes(buf.mx)
    val bb = ByteBuffer.allocate(
      8 + (if (a == null) 0 else a.length) + (if (b == null) 0 else b.length))
    bb.putInt(if (a == null) -1 else a.length)
    if (a != null) bb.put(a)
    bb.putInt(if (b == null) -1 else b.length)
    if (b != null) bb.put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): StringMinMaxBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    def read(): UTF8String = {
      val n = bb.getInt
      if (n < 0) null
      else {
        val a = new Array[Byte](n)
        bb.get(a)
        UTF8String.fromBytes(a)
      }
    }
    val buf = new StringMinMaxBuffer
    buf.mn = read()
    buf.mx = read()
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): StringMinMax =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): StringMinMax =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "string_min_max"
}
