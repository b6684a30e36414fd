package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Aggregation buffer: total count + the `limit` SMALLEST values seen,
  * held in a bounded max-heap — O(limit) memory no matter how large the
  * group is. */
final class BoundedCollectBuffer(val limit: Int) {
  var count: Long = 0L
  val heap = new java.util.PriorityQueue[java.lang.Long](
    math.max(limit, 1), java.util.Collections.reverseOrder[java.lang.Long]())

  def keep(v: Long): Unit =
    if (heap.size < limit) heap.add(v)
    else if (heap.peek() > v) { heap.poll(); heap.add(v) }

  def add(v: Long): Unit = { count += 1; keep(v) }

  def mergeFrom(o: BoundedCollectBuffer): Unit = {
    count += o.count
    o.heap.forEach(v => keep(v))
  }

  def sortedIds: Array[Long] = {
    val a = new Array[Long](heap.size)
    var i = 0
    val it = heap.iterator()
    while (it.hasNext) { a(i) = it.next(); i += 1 }
    java.util.Arrays.sort(a)
    a
  }
}

/** `bounded_collect(expr, limit)`: per group, the total count and the
  * `limit` smallest values as a sorted array — the skew-safe alternative
  * to collect_list for bucket algorithms: a group of 10M members costs
  * O(limit) buffer memory instead of a 10M-element array row. Output:
  * struct(cnt BIGINT, ids ARRAY<BIGINT>). The custom-AGGREGATE tier of
  * the engine (TypedImperativeAggregate), beside the scalar kernels and
  * the TopKPerKey physical operator. */
case class BoundedCollect(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedCollectBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("ids", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bounded_collect expects bigint input, got $other")
  }

  override def createAggregationBuffer(): BoundedCollectBuffer =
    new BoundedCollectBuffer(limit)

  override def update(buf: BoundedCollectBuffer,
      input: InternalRow): BoundedCollectBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: BoundedCollectBuffer,
      b2: BoundedCollectBuffer): BoundedCollectBuffer = {
    b1.mergeFrom(b2)
    b1
  }

  override def eval(buf: BoundedCollectBuffer): Any =
    InternalRow(buf.count, new GenericArrayData(buf.sortedIds))

  override def serialize(buf: BoundedCollectBuffer): Array[Byte] = {
    val ids = buf.sortedIds
    val bb = ByteBuffer.allocate(8 + 4 + 8 * ids.length)
    bb.putLong(buf.count)
    bb.putInt(ids.length)
    ids.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollectBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BoundedCollectBuffer(limit)
    buf.count = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.keep(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BoundedCollect =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bounded_collect"
}
