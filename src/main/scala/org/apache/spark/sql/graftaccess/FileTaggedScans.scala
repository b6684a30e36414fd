package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `_file` metadata-column plumbing for the graft catalog
  * (SupportsMetadataColumns on GraftTable — Iceberg-parity row-level
  * file introspection).
  *
  * The catalog's reads delegate to Spark's native `ParquetTable`, which
  * has no DSv2 metadata columns, so this wrapper intercepts the scan:
  *
  *  - when `_file` is NOT referenced, `build()` returns the untouched
  *    delegate scan — identical plan, every pushdown intact (pruning,
  *    filters, aggregates all forward to the delegate builder);
  *  - when it IS referenced, the ONE delegate scan is planned normally
  *    and its `FilePartition`s are re-grouped so each input partition
  *    reads a single file (a split file stays split — several
  *    partitions, same tag); readers append that partition's file path
  *    as a constant trailing string column. Planning stays O(one scan)
  *    on the driver — Iceberg serves `_file` the same way, as a
  *    per-split constant inside a single scan. Columnar reads stay
  *    columnar: the tag rides along as a ConstantColumnVector per
  *    batch, so the vectorized parquet path survives the tag column.
  *
  * Lives under `org.apache.spark.sql` because the delegate's filter
  * channel (`SupportsPushDownCatalystFilters`) is `private[sql]`. */
object FileTaggedScans {
  val FileCol = "_file"

  final class Builder(plain: ScanBuilder)
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters
      with SupportsPushDownAggregates {

    private var wantFile = false

    override def pruneColumns(requiredSchema: StructType): Unit = {
      wantFile = requiredSchema.fieldNames.contains(FileCol)
      val dataOnly = StructType(requiredSchema.filterNot(_.name == FileCol))
      plain match {
        case p: SupportsPushDownRequiredColumns => p.pruneColumns(dataOnly)
        case _ => ()
      }
    }

    override def pushFilters(fs: Seq[Expression]): Seq[Expression] =
      plain match {
        case p: SupportsPushDownCatalystFilters => p.pushFilters(fs)
        case _ => fs
      }

    override def pushedFilters: Array[Predicate] = plain match {
      case p: SupportsPushDownCatalystFilters => p.pushedFilters
      case _ => Array.empty
    }

    // Aggregate pushdown replaces the scan output wholesale; a pushed
    // aggregation never coexists with a metadata-column reference, so
    // forwarding to the plain delegate is always safe.
    override def pushAggregation(aggregation: Aggregation): Boolean =
      plain match {
        case p: SupportsPushDownAggregates => p.pushAggregation(aggregation)
        case _ => false
      }
    override def supportCompletePushDown(aggregation: Aggregation): Boolean =
      plain match {
        case p: SupportsPushDownAggregates =>
          p.supportCompletePushDown(aggregation)
        case _ => false
      }

    override def build(): Scan = {
      val scan = plain.build()
      if (wantFile) new TaggedScan(scan) else scan
    }
  }

  private final class TaggedScan(delegate: Scan) extends Scan with Batch {
    override def readSchema(): StructType =
      StructType(delegate.readSchema().fields :+
        StructField(FileCol, StringType, nullable = false))
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-file-tagged(${delegate.description()})"

    /** Re-group the delegate's partitions so each reads ONE file: a
      * `FilePartition` packing several small files splits into one
      * partition per file (order preserved). */
    override def planInputPartitions(): Array[InputPartition] =
      regroupByFile(delegate.toBatch.planInputPartitions())

    override def createReaderFactory(): PartitionReaderFactory =
      new TaggedReaderFactory(delegate.toBatch.createReaderFactory())
  }

  private[sql] final case class TaggedPartition(
      inner: InputPartition, file: String) extends InputPartition {
    override def preferredLocations(): Array[String] =
      inner.preferredLocations()
  }

  /** One tagged partition per contiguous same-file run. Fails fast on a
    * non-FilePartition: every delegate here is Spark's parquet scan,
    * whose batches plan FilePartitions only — silently tagging an
    * unexpected partition type with an empty `_file` would skew
    * count(DISTINCT _file)-style queries instead of surfacing the bug
    * (the column is declared non-nullable with absolute-path
    * semantics). Exposed for direct spec coverage of the reject. */
  private[sql] def regroupByFile(
      parts: Array[InputPartition]): Array[InputPartition] = {
    val out = Array.newBuilder[InputPartition]
    var idx = 0
    parts.foreach {
      case fp: FilePartition =>
        var run = Vector.empty[org.apache.spark.sql.execution.datasources.PartitionedFile]
        def flush(): Unit = if (run.nonEmpty) {
          val path = run.head.filePath.toPath.toString
          out += TaggedPartition(FilePartition(idx, run.toArray), path)
          idx += 1
          run = Vector.empty
        }
        fp.files.foreach { f =>
          if (run.nonEmpty && run.head.filePath != f.filePath) flush()
          run :+= f
        }
        flush()
      case other => throw new IllegalStateException(
        s"_file tagging expects FilePartitions from the parquet delegate, " +
          s"got ${other.getClass.getName} — cannot attribute rows to a file")
    }
    out.result()
  }

  /** Row readers append the tag via a JoinedRow; columnar readers keep
    * the delegate's VECTORIZED path and append a
    * [[org.apache.spark.sql.execution.vectorized.ConstantColumnVector]]
    * (the tag is per-partition constant by construction) — an
    * introspection scan costs one extra constant vector per batch, not
    * the vectorized reader. */
  private final class TaggedReaderFactory(
      inner: PartitionReaderFactory) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(p.asInstanceOf[TaggedPartition].inner)

    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val tp = p.asInstanceOf[TaggedPartition]
      val r = inner.createReader(tp.inner)
      val tag = new GenericInternalRow(
        Array[Any](UTF8String.fromString(tp.file)))
      val joined = new JoinedRow
      new PartitionReader[InternalRow] {
        override def next(): Boolean = r.next()
        override def get(): InternalRow = joined(r.get(), tag)
        override def close(): Unit = r.close()
      }
    }

    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
      import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
      val tp = p.asInstanceOf[TaggedPartition]
      val r = inner.createColumnarReader(tp.inner)
      val path = UTF8String.fromString(tp.file)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = r.next()
        override def get(): ColumnarBatch = {
          val b = r.get()
          val tag = new ConstantColumnVector(b.numRows(), StringType)
          tag.setUtf8String(path)
          val cols = Array.tabulate[ColumnVector](b.numCols())(b.column) :+ tag
          new ColumnarBatch(cols, b.numRows())
        }
        override def close(): Unit = r.close()
      }
    }
  }
}
