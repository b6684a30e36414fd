package org.apache.spark.sql.graftaccess

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.ProjectingInternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-on-read scan wrapper for the graft catalog: applies position-
  * delete sidecars ([[graft.catalog.DeleteSidecars]]) below the query
  * plan, so every consumer of a MOR table — SQL, DataFrame, row-level
  * operation rewrites — transparently sees deleted rows gone.
  *
  * Mechanism: the delegate `ParquetScan`'s `readDataSchema` gains
  * Spark's TEMPORARY ROW-INDEX column
  * (`ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME`), which both
  * parquet reader paths populate with the row's ABSOLUTE position in its
  * file — correct under column pruning, predicate pushdown, row-group
  * skipping and file splits (it is the machinery behind
  * `_metadata.row_index`). Readers then drop rows whose (file, position)
  * appears in the broadcast delete index and project the scratch column
  * away. Because positions are absolute, FILTER PUSHDOWN STAYS ON —
  * a pushed filter only removes rows this wrapper would have served or
  * dropped identically. Aggregate pushdown is disabled (a footer-served
  * count would see deleted rows), and this wrapper's slice is row-based
  * (Spark requires all-or-nothing columnar per scan) — but since
  * VERDICT r15 #1 the catalog plans it over ONLY the files with pending
  * delete entries: clean files ride a separate vectorized slice of the
  * same composite scan ([[MultiGenScans]] "mor split"), so the MOR read
  * tax is O(masked files), not the whole table; compaction folds the
  * sidecars away and restores the single-scan path entirely.
  *
  * Also serves the `_file` metadata column (same per-file partition
  * regrouping as [[FileTaggedScans]], which remains the zero-overhead
  * path for tables with no pending deletes). */
object MorScans {

  private val RowIdxField = StructField(
    ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME, LongType,
    nullable = true)

  /** Execution-side mask context for BOTH sidecar types, broadcast once
    * per scan build and shared by every masked slice:
    *  - `pos`: absolute-path data file → sorted deleted positions
    *    (position-delete sidecars);
    *  - `eqBatches`: pending equality-delete commits (key columns +
    *    catalyst-typed tuple sets + the commit version);
    *  - `fileSeen`: absolute-path data file → first-seen snapshot
    *    version (a batch at version vB masks a file iff its first-seen
    *    version < vB — Iceberg's strict sequence-number rule, so files
    *    committed with or after the delete are never masked). */
  final case class MaskContext(
      pos: Map[String, Array[Long]],
      eqBatches: Array[graft.catalog.EqualityDeletes.Batch],
      fileSeen: Map[String, Long]) extends Serializable {
    def eqColumns: Seq[(String, org.apache.spark.sql.types.DataType)] =
      eqBatches.toSeq.flatMap(b => b.cols.zip(b.types)).distinct
  }

  /** `loadCtx` runs on the driver when the scan plans and returns the
    * BROADCAST mask context. Callers memoize it so a multi-slice scan's
    * slices share ONE sidecar read and ONE broadcast. */
  final class Builder(plain: ScanBuilder, fileColAllowed: Boolean,
      loadCtx: () => Broadcast[MaskContext])
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters {
    // deliberately NOT SupportsPushDownAggregates: a pushed aggregate is
    // answered from footer metadata and would count masked rows

    private var wantFile = false

    override def pruneColumns(requiredSchema: StructType): Unit = {
      wantFile = fileColAllowed &&
        requiredSchema.fieldNames.contains(FileTaggedScans.FileCol)
      val dataOnly = StructType(
        if (wantFile) requiredSchema.filterNot(_.name == FileTaggedScans.FileCol)
        else requiredSchema.fields.toSeq)
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

    override def build(): Scan = {
      val scan0 = plain.build() match {
        case p: ParquetScan => p
        case other => throw new IllegalStateException(
          s"merge-on-read scans wrap Spark's ParquetScan, got " +
            s"${other.getClass.getName}")
      }
      val ctxB = loadCtx()
      // equality-delete key columns the pruned read dropped must still
      // be READ (the mask needs their values); they ride as scratch
      // columns next to the row index and are projected away with it.
      // An IDENTITY PARTITION key column is NOT in the data files (the
      // write drops it to dir names) — a data-scratch read would serve
      // NULL and silently miss; it routes through readPartitionSchema
      // instead, where the reader serves the dir value (VERDICT r16 #2).
      val present = scan0.readSchema().fieldNames.toSet
      val partCols = scan0.fileIndex.partitionSchema.fieldNames.toSet
      val missing = ctxB.value.eqColumns
        .filterNot { case (c, _) => present.contains(c) }
      val extra = missing.collect { case (c, t) if !partCols.contains(c) =>
        StructField(c, t, nullable = true) }
      val extraPart = missing.collect { case (c, t) if partCols.contains(c) =>
        StructField(c, t, nullable = true) }
      val withIdx = scan0.copy(
        readDataSchema =
          StructType(scan0.readDataSchema.fields ++ extra :+ RowIdxField),
        readPartitionSchema =
          StructType(scan0.readPartitionSchema.fields ++ extraPart))
      new MorScan(withIdx, scan0.readSchema(), extra.length,
        extraPart.length, wantFile, ctxB)
    }
  }

  private final class MorScan(withIdx: ParquetScan, outSchema: StructType,
      extraCount: Int, extraPartCount: Int, wantFile: Boolean,
      ctx: Broadcast[MaskContext])
      extends Scan with Batch with SupportsReportStatistics {

    override def readSchema(): StructType =
      if (wantFile)
        StructType(outSchema.fields :+
          StructField(FileTaggedScans.FileCol, StringType, nullable = false))
      else outSchema

    override def toBatch: Batch = this
    override def description(): String =
      s"graft-mor(${withIdx.description()})"
    // the delegate's estimate, slightly over (masked rows counted) —
    // fine for join-side sizing, conservative in the safe direction
    override def estimateStatistics(): Statistics =
      withIdx.estimateStatistics()

    override def planInputPartitions(): Array[InputPartition] =
      FileTaggedScans.regroupByFile(withIdx.toBatch.planInputPartitions())

    override def createReaderFactory(): PartitionReaderFactory = {
      // rows arrive as [dataCols..., eqScratch..., rowIdx,
      // partCols..., partScratch...]; every scratch column (data-side
      // AND the appended partition-key scratch) is projected away
      val full = withIdx.readSchema()
      val rowIdxOrd = withIdx.readDataSchema.length - 1
      val scratchLow = rowIdxOrd - extraCount
      val keepOrdinals = (0 until full.length)
        .filterNot(o => (o >= scratchLow && o <= rowIdxOrd) ||
          o >= full.length - extraPartCount)
      val eqOrds: Array[Array[Int]] = ctx.value.eqBatches.map(b =>
        b.cols.map(full.fieldIndex).toArray)
      new MorReaderFactory(withIdx.toBatch.createReaderFactory(), ctx,
        rowIdxOrd, full, keepOrdinals, eqOrds, wantFile)
    }
  }

  /** Columnar-first (VERDICT r15 #1): masked batches stay VECTORIZED by
    * remapping row ids through a survivors array
    * ([[RemappedColumnVector]] — the same shape as Iceberg's Spark
    * reader's rowIdMapping), so the whole scan keeps columnar parquet
    * reads even while sidecars pend (Spark's BatchScanExec requires
    * every partition to agree on columnar-ness). The row path remains
    * for delegates that plan row readers (e.g. vectorization disabled
    * by conf). */
  private final class MorReaderFactory(
      inner: PartitionReaderFactory,
      ctx: Broadcast[MaskContext],
      rowIdxOrd: Int, innerSchema: StructType, keepOrdinals: Seq[Int],
      eqOrds: Array[Array[Int]],
      wantFile: Boolean) extends PartitionReaderFactory {

    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(
        p.asInstanceOf[FileTaggedScans.TaggedPartition].inner)

    /** The equality batches that apply to this file: committed STRICTLY
      * after the file was first seen. */
    private def applicable(file: String): Array[Int] = {
      val c = ctx.value
      if (c.eqBatches.isEmpty) Array.emptyIntArray
      else {
        val seen = c.fileSeen.getOrElse(file, Long.MaxValue)
        c.eqBatches.indices.filter(i => c.eqBatches(i).version > seen).toArray
      }
    }

    private def vecValue(v: org.apache.spark.sql.vectorized.ColumnVector,
        i: Int, dt: org.apache.spark.sql.types.DataType): Any = {
      import org.apache.spark.sql.types._
      if (v.isNullAt(i)) null
      else dt match {
        case BooleanType => Boolean.box(v.getBoolean(i))
        case ByteType => Byte.box(v.getByte(i))
        case ShortType => Short.box(v.getShort(i))
        case IntegerType | DateType => Int.box(v.getInt(i))
        case LongType | TimestampType | TimestampNTZType =>
          Long.box(v.getLong(i))
        // -0.0 normalized to 0.0: the key set was normalized the same
        // way (EqualityDeletes.normKeyValue) so the boxed-equality
        // compare matches SQL's <=> semantics (ADVICE r16)
        case FloatType =>
          val f = v.getFloat(i); Float.box(if (f == 0.0f) 0.0f else f)
        case DoubleType =>
          val d = v.getDouble(i); Double.box(if (d == 0.0d) 0.0d else d)
        case StringType => v.getUTF8String(i)
        case d: DecimalType => v.getDecimal(i, d.precision, d.scale)
        case other => throw new IllegalStateException(
          s"unsupported equality-delete key type $other")
      }
    }

    /** Whether row `i` of columnar batch `b` matches any applicable
      * equality batch's key set. */
    private def eqMaskedVec(b: org.apache.spark.sql.vectorized.ColumnarBatch,
        i: Int, appl: Array[Int]): Boolean = {
      val c = ctx.value
      var a = 0
      while (a < appl.length) {
        val batch = c.eqBatches(appl(a))
        val ords = eqOrds(appl(a))
        val tuple = new Array[Any](ords.length)
        var j = 0
        while (j < ords.length) {
          tuple(j) = vecValue(b.column(ords(j)), i, batch.types(j))
          j += 1
        }
        if (batch.keys.contains(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(tuple)))
          return true
        a += 1
      }
      false
    }

    private def eqMaskedRow(row: InternalRow, appl: Array[Int]): Boolean = {
      val c = ctx.value
      var a = 0
      while (a < appl.length) {
        val batch = c.eqBatches(appl(a))
        val ords = eqOrds(appl(a))
        val tuple = new Array[Any](ords.length)
        var j = 0
        while (j < ords.length) {
          tuple(j) =
            if (row.isNullAt(ords(j))) null
            else graft.catalog.EqualityDeletes.normKeyValue(
              row.get(ords(j), batch.types(j)))
          j += 1
        }
        if (batch.keys.contains(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(tuple)))
          return true
        a += 1
      }
      false
    }

    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      import org.apache.spark.sql.execution.vectorized.ConstantColumnVector
      import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
      val tp = p.asInstanceOf[FileTaggedScans.TaggedPartition]
      val r = inner.createColumnarReader(tp.inner)
      val deleted: Array[Long] = ctx.value.pos.getOrElse(tp.file, null)
      val appl = applicable(tp.file)
      val path = UTF8String.fromString(tp.file)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = r.next()
        override def get(): ColumnarBatch = {
          val b = r.get()
          val n = b.numRows()
          val idxCol = b.column(rowIdxOrd)
          val mapBuf = new Array[Int](n)
          var k = 0
          var i = 0
          while (i < n) {
            val survives =
              (deleted == null || java.util.Arrays.binarySearch(
                deleted, idxCol.getLong(i)) < 0) &&
              (appl.isEmpty || !eqMaskedVec(b, i, appl))
            if (survives) {
              mapBuf(k) = i
              k += 1
            }
            i += 1
          }
          val keep = keepOrdinals.map(b.column)
          val cols0: Seq[ColumnVector] =
            if (k == n) keep // no masked row in this batch: zero-copy
            else {
              val m = java.util.Arrays.copyOf(mapBuf, k)
              keep.map(v => new RemappedColumnVector(v, m))
            }
          val cols =
            if (!wantFile) cols0
            else {
              val tag = new ConstantColumnVector(k, StringType)
              tag.setUtf8String(path)
              cols0 :+ tag
            }
          new ColumnarBatch(cols.toArray, k)
        }
        override def close(): Unit = r.close()
      }
    }

    override def createReader(
        p: InputPartition): PartitionReader[InternalRow] = {
      val tp = p.asInstanceOf[FileTaggedScans.TaggedPartition]
      val r = inner.createReader(tp.inner)
      val deleted: Array[Long] = ctx.value.pos.getOrElse(tp.file, null)
      val appl = applicable(tp.file)
      val proj = ProjectingInternalRow(
        StructType(keepOrdinals.map(innerSchema.fields)), keepOrdinals)
      val tag = new GenericInternalRow(
        Array[Any](UTF8String.fromString(tp.file)))
      val joined = new JoinedRow
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = {
          while (r.next()) {
            val row = r.get()
            val survives =
              (deleted == null ||
                java.util.Arrays.binarySearch(deleted,
                  row.getLong(rowIdxOrd)) < 0) &&
              (appl.isEmpty || !eqMaskedRow(row, appl))
            if (survives) {
              cur = row
              return true
            }
          }
          false
        }
        override def get(): InternalRow = {
          proj.project(cur)
          if (wantFile) joined(proj, tag) else proj
        }
        override def close(): Unit = r.close()
      }
    }
  }
}
