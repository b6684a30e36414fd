package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, FloatType, IntegerType}
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.UTF8String

/** A ColumnVector view applying an Iceberg-legal TYPE WIDENING on read
  * (type promotion, round 16): old-generation files store the narrow
  * physical type (int where the table now declares bigint, float for
  * double, a lower-precision decimal) and this wrapper serves the wide
  * type without copying — int→long via getInt, float→double via
  * getFloat, decimal precision growth by re-labelling (the value is
  * identical; only the storage width differs). Keeps promoted
  * generations on the VECTORIZED read path. */
final class WideningColumnVector(
    delegate: ColumnVector, from: DataType, to: DataType)
    extends ColumnVector(to) {

  private val fromDecimal: DecimalType = from match {
    case d: DecimalType => d
    case _ => null
  }

  override def close(): Unit = delegate.close()
  // the delegate (the parquet reader's vector) is reused across
  // batches and must decide for itself — see RemappedColumnVector
  override def closeIfFreeable(): Unit = delegate.closeIfFreeable()
  override def hasNull: Boolean = delegate.hasNull
  override def numNulls(): Int = delegate.numNulls()
  override def isNullAt(i: Int): Boolean = delegate.isNullAt(i)

  override def getLong(i: Int): Long = from match {
    case IntegerType => delegate.getInt(i).toLong
    case _ => delegate.getLong(i)
  }
  override def getDouble(i: Int): Double = from match {
    case FloatType => delegate.getFloat(i).toDouble
    case _ => delegate.getDouble(i)
  }
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    // read under the NARROW storage layout; the returned Decimal value
    // is exact at any wider precision with the same scale
    delegate.getDecimal(i, fromDecimal.precision, fromDecimal.scale)

  // non-promotable accessors delegate untouched (never hit for the
  // three supported widenings, but keep the vector fully functional)
  override def getBoolean(i: Int): Boolean = delegate.getBoolean(i)
  override def getByte(i: Int): Byte = delegate.getByte(i)
  override def getShort(i: Int): Short = delegate.getShort(i)
  override def getInt(i: Int): Int = delegate.getInt(i)
  override def getFloat(i: Int): Float = delegate.getFloat(i)
  override def getArray(i: Int): ColumnarArray = delegate.getArray(i)
  override def getMap(i: Int): ColumnarMap = delegate.getMap(i)
  override def getUTF8String(i: Int): UTF8String = delegate.getUTF8String(i)
  override def getBinary(i: Int): Array[Byte] = delegate.getBinary(i)
  override def getChild(ordinal: Int): ColumnVector = delegate.getChild(ordinal)
}
