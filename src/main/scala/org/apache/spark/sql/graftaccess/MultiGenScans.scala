package org.apache.spark.sql.graftaccess

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

/** Composite scan over SCHEMA GENERATIONS of one graft table
  * ([[graft.catalog.FieldIds]]): files written before a RENAME/DROP
  * COLUMN carry old physical column names, so each generation gets its
  * own delegate scan over its files with the CURRENT schema translated
  * to that generation's physical names (fields whose id the generation
  * lacks are requested under an impossible name and read NULL — never a
  * stale same-named column's bytes). Row layouts are positionally
  * identical across generations by construction (same pruned field
  * order, same partition columns), so the union is a plain partition
  * concat with per-partition reader dispatch.
  *
  * Pushdown: column pruning forwards to every slice (renamed); filters
  * forward ONLY to slices where every referenced column physically
  * exists (attribute names rewritten), and ALL filters are returned as
  * residual so Catalyst re-applies them above the scan — redundant on
  * the pushed slices, required on the skipped ones. Aggregate pushdown
  * is off (a footer-served aggregate cannot span renamed generations).
  * The per-slice delegates may already be MOR- or `_file`-wrapped; this
  * layer is agnostic to that (it only forwards builder calls and
  * dispatches partitions). Compaction rewrites every file under the
  * current generation and restores the single-scan fast path. */
object MultiGenScans {

  /** Zero-copy column REORDER over a batch: serves `to`-ordered columns
    * from an inner batch whose order differs (r18 — the row-level
    * GroupFilterScan reports the DECLARED schema, but its ParquetScan
    * delegates serve identity-partition columns LAST; a non-trailing
    * partition column made every row-level command read misaligned
    * ordinals). `perm(i)` = the inner ordinal serving output column i.
    * Columnar batches permute the vector array; row readers project by
    * ordinal — neither copies values. */
  def reorder(inner: Batch, from: StructType, to: StructType): Batch =
    if (from.fieldNames.sameElements(to.fieldNames)) inner
    else {
      val perm = to.fieldNames.map(from.fieldIndex)
      new ReorderBatch(inner, perm, to)
    }

  private final class ReorderBatch(inner: Batch, perm: Array[Int],
      to: StructType) extends Batch {
    override def planInputPartitions(): Array[InputPartition] =
      inner.planInputPartitions()
    override def createReaderFactory(): PartitionReaderFactory =
      ReorderFactory(inner.createReaderFactory(), perm, to)
  }

  private final case class ReorderFactory(f: PartitionReaderFactory,
      perm: Array[Int], to: StructType) extends PartitionReaderFactory {
    override def supportColumnarReads(p: InputPartition): Boolean =
      f.supportColumnarReads(p)
    override def createReader(p: InputPartition)
        : PartitionReader[InternalRow] = {
      val r = f.createReader(p)
      val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        to, perm.toIndexedSeq)
      new PartitionReader[InternalRow] {
        override def next(): Boolean = r.next()
        override def get(): InternalRow = { proj.project(r.get()); proj }
        override def close(): Unit = r.close()
      }
    }
    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
      val r = f.createColumnarReader(p)
      new PartitionReader[ColumnarBatch] {
        override def next(): Boolean = r.next()
        override def get(): ColumnarBatch = {
          val b = r.get()
          new ColumnarBatch(
            perm.map(b.column(_): ColumnVector), b.numRows())
        }
        override def close(): Unit = r.close()
      }
    }
  }

  /** One generation's delegate: `rename` maps CURRENT field name →
    * this generation's physical name (including the absent-marker);
    * `noPush` lists current names whose physical TYPE differs in this
    * generation (promoted fields — a filter carrying the wide type must
    * not reach a narrow-typed parquet column). */
  final case class GenSlice(plain: ScanBuilder, rename: Map[String, String],
      noPush: Set[String] = Set.empty)

  /** `desc` labels the composite in EXPLAIN output — "schema
    * generations" for rename/drop splits, "mor split" for the
    * clean-vs-masked delete-sidecar split (VERDICT r15 #1), possibly
    * both. Slices align BY NAME (through their rename maps), not by
    * position: partition-spec eras with DIFFERENT identity-column sets
    * serve identity columns at different ordinals (ParquetScan puts
    * dir-inferred columns last), so the dispatch permutes each slice's
    * columns into the composite order. The LAST slice reports the
    * composite's (current-name) readSchema. */
  final class Builder(slices: Seq[GenSlice], desc: String = "schema generations")
      extends ScanBuilder
      with SupportsPushDownRequiredColumns
      with SupportsPushDownCatalystFilters {
    require(slices.nonEmpty)

    override def pruneColumns(requiredSchema: StructType): Unit =
      slices.foreach { s =>
        val renamed = StructType(requiredSchema.fields.map(f =>
          f.copy(name = s.rename.getOrElse(f.name, f.name))))
        s.plain match {
          case p: SupportsPushDownRequiredColumns => p.pruneColumns(renamed)
          case _ => ()
        }
      }

    override def pushFilters(fs: Seq[Expression]): Seq[Expression] = {
      slices.foreach { s =>
        val absent = s.rename.collect {
          case (cur, phys)
              if phys.startsWith(graft.catalog.FieldIds.AbsentPrefix) => cur
        }.toSet
        val eligible = fs.filter(_.references.forall(a =>
          !absent(a.name) && !s.noPush(a.name)))
        val renamed = eligible.map(_.transform {
          case a: AttributeReference if s.rename.contains(a.name) =>
            a.withName(s.rename(a.name))
        })
        s.plain match {
          case p: SupportsPushDownCatalystFilters => p.pushFilters(renamed)
          case _ => ()
        }
      }
      fs // ALL residual: skipped slices never saw them
    }

    override def pushedFilters: Array[Predicate] = slices.last.plain match {
      case p: SupportsPushDownCatalystFilters => p.pushedFilters
      case _ => Array.empty
    }

    override def build(): Scan =
      new CompositeScan(slices.map(_.plain.build()), slices.map(_.rename),
        desc)
  }

  private final case class SlicePartition(inner: InputPartition, slice: Int)
      extends InputPartition {
    override def preferredLocations(): Array[String] =
      inner.preferredLocations()
  }

  private final class CompositeScan(scans: Seq[Scan],
      renames: Seq[Map[String, String]], desc: String)
      extends Scan with Batch with SupportsReportStatistics {
    // the current generation's scan already reports CURRENT names; all
    // slices are positionally identical
    override def readSchema(): StructType = scans.last.readSchema()
    override def toBatch: Batch = this
    override def description(): String =
      s"graft-composite(${scans.length} slices: $desc)"

    /** Sum of the slices' estimates (every delegate here is ultimately
      * Spark's ParquetScan, which reports) — without this the composite
      * would report UNKNOWN and a broadcast-eligible small table behind
      * a pending sidecar would stop broadcasting. */
    override def estimateStatistics(): Statistics = {
      val parts = scans.map {
        case s: SupportsReportStatistics => Some(s.estimateStatistics())
        case _ => None
      }
      new Statistics {
        private def sum(f: Statistics => java.util.OptionalLong)
            : java.util.OptionalLong =
          if (parts.exists(p => p.isEmpty || !f(p.get).isPresent))
            java.util.OptionalLong.empty()
          else java.util.OptionalLong.of(parts.map(p => f(p.get).getAsLong).sum)
        override def sizeInBytes(): java.util.OptionalLong =
          sum(_.sizeInBytes())
        override def numRows(): java.util.OptionalLong = sum(_.numRows())
      }
    }

    private lazy val batches = scans.map(_.toBatch)

    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, i) =>
        b.planInputPartitions().map(p => SlicePartition(p, i): InputPartition)
      }.toArray

    override def createReaderFactory(): PartitionReaderFactory =
      new DispatchFactory(batches.map(_.createReaderFactory()),
        scans.map(_.readSchema()), readSchema(), renames)
  }

  /** Per-slice reader dispatch. Slices align with the composite BY NAME
    * through their rename maps (composite/current name → the slice's
    * physical name): a slice may serve columns at different ORDINALS
    * (identity-partition columns land last in a ParquetScan's schema,
    * and the identity SET can differ per spec era) and at narrower
    * TYPES (type-promoted generations). The reader permutes columns
    * into composite order and widens where types differ — columnar
    * batches stay zero-copy via vector permutation +
    * [[WideningColumnVector]]; row readers project by bound ordinal
    * with a Cast on promoted fields. Slices that already align (the
    * common case) keep the untouched passthrough reader. */
  private final class DispatchFactory(factories: Seq[PartitionReaderFactory],
      sliceSchemas: Seq[StructType], outSchema: StructType,
      renames: Seq[Map[String, String]])
      extends PartitionReaderFactory {

    /** Composite ordinal j → slice-i ordinal serving it (by name), or
      * -1 when the slice has no such column. -1 happens ONLY for
      * hidden-partition DIR columns another era's ParquetScan appended
      * to the composite's reported schema (`ts_hour` after ADD
      * PARTITION FIELD — old-era file indexes don't have the dir):
      * readers never request them, so the dispatch serves NULL there —
      * a real data column can never hit -1 (every slice schema carries
      * every declared column, absent generations via their
      * absent-marker name). */
    private def permFor(i: Int): Array[Int] = {
      val slice = sliceSchemas(i)
      outSchema.fields.map { o =>
        val phys = renames(i).getOrElse(o.name, o.name)
        if (slice.fieldNames.contains(phys)) slice.fieldIndex(phys) else -1
      }
    }

    private def isPassthrough(i: Int, perm: Array[Int]): Boolean =
      perm.zipWithIndex.forall { case (p, j) => p == j } &&
        perm.indices.forall(j =>
          sliceSchemas(i).fields(perm(j)).dataType ==
            outSchema.fields(j).dataType)

    override def supportColumnarReads(p: InputPartition): Boolean = {
      val sp = p.asInstanceOf[SlicePartition]
      factories(sp.slice).supportColumnarReads(sp.inner)
    }

    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val sp = p.asInstanceOf[SlicePartition]
      val inner = factories(sp.slice).createReader(sp.inner)
      val perm = permFor(sp.slice)
      if (isPassthrough(sp.slice, perm)) inner
      else {
        val from = sliceSchemas(sp.slice)
        val exprs = outSchema.fields.zipWithIndex.map { case (o, j) =>
          if (perm(j) < 0)
            org.apache.spark.sql.catalyst.expressions.Literal(null, o.dataType)
              : org.apache.spark.sql.catalyst.expressions.Expression
          else {
            val b = org.apache.spark.sql.catalyst.expressions.BoundReference(
              perm(j), from.fields(perm(j)).dataType, nullable = true)
            if (from.fields(perm(j)).dataType != o.dataType)
              org.apache.spark.sql.catalyst.expressions.Cast(b, o.dataType)
            else b: org.apache.spark.sql.catalyst.expressions.Expression
          }
        }
        new PartitionReader[InternalRow] {
          private val proj = org.apache.spark.sql.catalyst.expressions
            .UnsafeProjection.create(exprs)
          override def next(): Boolean = inner.next()
          override def get(): InternalRow = proj(inner.get())
          override def close(): Unit = inner.close()
        }
      }
    }

    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      import org.apache.spark.sql.vectorized.{ColumnarBatch, ColumnVector}
      val sp = p.asInstanceOf[SlicePartition]
      val inner = factories(sp.slice).createColumnarReader(sp.inner)
      val perm = permFor(sp.slice)
      if (isPassthrough(sp.slice, perm)) inner
      else {
        val from = sliceSchemas(sp.slice)
        new PartitionReader[ColumnarBatch] {
          override def next(): Boolean = inner.next()
          override def get(): ColumnarBatch = {
            val b = inner.get()
            val cols = Array.tabulate[ColumnVector](outSchema.length) { j =>
              val outType = outSchema.fields(j).dataType
              if (perm(j) < 0) {
                val nulls = new org.apache.spark.sql.execution.vectorized
                  .ConstantColumnVector(b.numRows(), outType)
                nulls.setNull()
                nulls: ColumnVector
              } else {
                val src = b.column(perm(j))
                val fromType = from.fields(perm(j)).dataType
                if (fromType != outType)
                  new WideningColumnVector(src, fromType, outType)
                else src
              }
            }
            new ColumnarBatch(cols, b.numRows())
          }
          override def close(): Unit = inner.close()
        }
      }
    }
  }
}
