package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.types.{ArrayType, Decimal, MapType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** A ColumnVector view that REMAPS row ids through a survivors array —
  * the vectorized merge-on-read mask (the same shape as Iceberg's Spark
  * reader's rowIdMapping): position-deleted rows are skipped by
  * indirection, so a batch with pending deletes stays COLUMNAR instead
  * of dropping the whole scan to row-based reads. `map(i)` is the
  * delegate row id of the i-th surviving row; the wrapping batch
  * reports `map.length` rows (Spark's BatchScanExec requires every
  * partition of a scan to agree on columnar-ness, so the masked slice
  * must stay columnar for the clean slice to keep vectorized reads —
  * VERDICT r15 #1).
  *
  * Children: struct-like children (structs, intervals, variants) are
  * row-indexed and wrap recursively; array/map children are
  * ELEMENT-indexed (their offsets come from the delegate's remapped
  * `getArray`/`getMap`) and must pass through raw. */
final class RemappedColumnVector(
    delegate: ColumnVector, map: Array[Int])
    extends ColumnVector(delegate.dataType()) {

  override def close(): Unit = delegate.close()
  // CRITICAL: the default closeIfFreeable() calls close(). Spark's
  // ColumnarToRow calls closeIfFreeable between batches; the delegate
  // (the vectorized parquet reader's WritableColumnVector) is REUSED
  // across batches and must decide for itself — defaulting here closed
  // it after batch 1 and batch 2 NPE'd inside the reader ("nulls is
  // null"), which only multi-batch files ever hit.
  override def closeIfFreeable(): Unit = delegate.closeIfFreeable()
  // conservative: the delegate's nulls may all sit in masked-out rows,
  // but hasNull=true only costs consumers a null check, never wrongness
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls(): Int = delegate.numNulls()

  override def isNullAt(i: Int): Boolean = delegate.isNullAt(map(i))
  override def getBoolean(i: Int): Boolean = delegate.getBoolean(map(i))
  override def getByte(i: Int): Byte = delegate.getByte(map(i))
  override def getShort(i: Int): Short = delegate.getShort(map(i))
  override def getInt(i: Int): Int = delegate.getInt(map(i))
  override def getLong(i: Int): Long = delegate.getLong(map(i))
  override def getFloat(i: Int): Float = delegate.getFloat(map(i))
  override def getDouble(i: Int): Double = delegate.getDouble(map(i))
  override def getArray(i: Int): ColumnarArray = delegate.getArray(map(i))
  override def getMap(i: Int): ColumnarMap = delegate.getMap(map(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    delegate.getDecimal(map(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    delegate.getUTF8String(map(i))
  override def getBinary(i: Int): Array[Byte] = delegate.getBinary(map(i))

  override def getChild(ordinal: Int): ColumnVector =
    dataType() match {
      // array/map children are element-indexed: offsets already remap
      // through getArray/getMap above — wrapping them would corrupt
      case _: ArrayType | _: MapType => delegate.getChild(ordinal)
      case _ => new RemappedColumnVector(delegate.getChild(ordinal), map)
    }
}
