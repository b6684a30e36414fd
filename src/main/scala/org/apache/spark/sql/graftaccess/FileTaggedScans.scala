package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
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
  *  - when it IS referenced, the scan re-plans as one delegate scan PER
  *    FILE (recorded pruning/filters replayed onto each), and each
  *    file's partitions are tagged with that file's path; readers append
  *    the constant as a trailing string column. Row-based readers only —
  *    an introspection scan trades the vectorized path for the tag.
  *
  * Lives under `org.apache.spark.sql` because the delegate's filter
  * channel (`SupportsPushDownCatalystFilters`) is `private[sql]`. */
object FileTaggedScans {
  val FileCol = "_file"

  /** `perFile`: lazily builds (absoluteFilePath, per-file ScanBuilder)
    * pairs — only invoked when `_file` is actually requested. */
  final class Builder(
      plain: ScanBuilder,
      perFile: () => Seq[(String, ScanBuilder)])
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters
      with SupportsPushDownAggregates {

    private var wantFile = false
    private var prunedData: Option[StructType] = None
    private var filters: Seq[Expression] = Nil

    override def pruneColumns(requiredSchema: StructType): Unit = {
      wantFile = requiredSchema.fieldNames.contains(FileCol)
      val dataOnly = StructType(requiredSchema.filterNot(_.name == FileCol))
      prunedData = Some(dataOnly)
      plain match {
        case p: SupportsPushDownRequiredColumns => p.pruneColumns(dataOnly)
        case _ => ()
      }
    }

    override def pushFilters(fs: Seq[Expression]): Seq[Expression] = {
      filters = fs
      plain match {
        case p: SupportsPushDownCatalystFilters => p.pushFilters(fs)
        case _ => fs
      }
    }

    override def pushedFilters(): Array[Predicate] = plain match {
      case p: SupportsPushDownCatalystFilters => p.pushedFilters()
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

    override def build(): Scan =
      if (!wantFile) plain.build()
      else {
        val scans = perFile().map { case (file, b) =>
          (prunedData, b) match {
            case (Some(s), p: SupportsPushDownRequiredColumns) =>
              p.pruneColumns(s)
            case _ => ()
          }
          b match {
            case p: SupportsPushDownCatalystFilters if filters.nonEmpty =>
              p.pushFilters(filters)
            case _ => ()
          }
          (file, b.build())
        }
        new TaggedScan(scans, prunedData.getOrElse(new StructType()))
      }
  }

  private final class TaggedScan(scans: Seq[(String, Scan)],
      fallbackData: StructType) extends Scan with Batch {
    override def readSchema(): StructType = {
      // empty snapshot: no per-file scan to ask — the pruned data schema
      // is what the plan expects ahead of the tag column
      val data = scans.headOption.map(_._2.readSchema()).getOrElse(fallbackData)
      StructType(data.fields :+ StructField(FileCol, StringType,
        nullable = false))
    }
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-file-tagged(${scans.length} files)"

    override def planInputPartitions(): Array[InputPartition] =
      scans.zipWithIndex.flatMap { case ((file, s), i) =>
        s.toBatch.planInputPartitions().map(p => TaggedPartition(p, file, i))
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new TaggedReaderFactory(
        scans.map(_._2.toBatch.createReaderFactory()).toArray)
  }

  private final case class TaggedPartition(
      inner: InputPartition, file: String, scanIdx: Int)
      extends InputPartition

  private final class TaggedReaderFactory(
      inner: Array[PartitionReaderFactory]) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean = false
    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val tp = p.asInstanceOf[TaggedPartition]
      val r = inner(tp.scanIdx).createReader(tp.inner)
      val tag = new GenericInternalRow(
        Array[Any](UTF8String.fromString(tp.file)))
      val joined = new JoinedRow
      new PartitionReader[InternalRow] {
        override def next(): Boolean = r.next()
        override def get(): InternalRow = joined(r.get(), tag)
        override def close(): Unit = r.close()
      }
    }
  }
}
