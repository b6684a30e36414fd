package org.apache.spark.sql.graftaccess

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Literal, Murmur3Hash, Pmod, Substring, Subtract, UnsafeProjection}
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.catalog.PartitionTransforms

/** Distributed DSv2 parquet `BatchWrite` built on Spark's own writer
  * stack (`ParquetUtils.prepareWrite` → `ParquetOutputWriter` — the same
  * codepath `df.write.parquet` uses, so compression/timestamp/rebase
  * semantics match the V1 writes byte-for-byte). Those classes are
  * `private[sql]`, hence this bridge living under `org.apache.spark.sql`.
  *
  * Needed because Spark's row-level commands (MERGE INTO / UPDATE /
  * subquery DELETE) plan to `ReplaceDataExec`, which writes through
  * `Write.toBatch` — there is NO V1 fallback for `ReplaceData`, so the
  * catalog's usual `InsertableRelation` path can't serve them.
  *
  * Tasks stream rows straight to parquet files in `stagingDir` (each
  * writer one file per partition-dir; on a real cluster the staging dir
  * must be on the shared filesystem — it lives under the table
  * directory, which is). The driver-side `commit` gets the staged file
  * paths and runs the caller's snapshot-commit callback; `abort` hands
  * back whatever was staged for cleanup.
  *
  * Partitioned tables route rows to hive-layout `col=value/` dirs
  * (values escaped exactly like Spark's own dynamic partition write, so
  * the read side's partition-dir inference agrees). IDENTITY columns
  * are dropped from the data files — the same on-disk contract as the
  * catalog's V1 `partitionBy` writes. HIDDEN transforms (r17, VERDICT
  * r16 #1 — `days(ts)` / `bucket(n,k)` / `truncate(w,s)`) derive their
  * dir value per row through the SAME catalyst expressions the V1 write
  * path evaluates ([[PartitionTransforms.derive]]: an explicit-zone
  * Cast for days, Spark's Murmur3 `hash()` for bucket), compiled to one
  * `UnsafeProjection` per task, so a MERGE INTO a days-partitioned
  * table lands rewritten rows in exactly the dirs the prune path
  * expects — including rows whose UPDATE moved them to another day.
  * The Write declares a clustered distribution on the partition SOURCE
  * columns, so Spark shuffles the replacement data and each task sees
  * few partition dirs (bounding open writers / file count — the
  * dynamic-partition-write discipline at any scale). */
object BatchWrites {

  final case class Staged(path: String) extends WriterCommitMessage
  /** A writer that saw no rows: its file is deleted at task commit and
    * nothing publishes — empty shuffle partitions of a narrow MERGE must
    * not inflate the snapshot's file inventory with zero-row parquet. */
  case object StagedEmpty extends WriterCommitMessage
  /** Several files from one task (one per partition dir touched). */
  final case class StagedMany(paths: Seq[String]) extends WriterCommitMessage

  def parquetWrite(spark: SparkSession, schema: StructType,
      stagingDir: String, onCommit: Seq[String] => Unit,
      onAbort: Seq[String] => Unit,
      partitionSpec: Seq[PartitionTransforms.T] = Nil,
      partitionZone: Option[String] = None,
      orderCols: Seq[String] = Nil): Write = {
    val cs = spark.asInstanceOf[ClassicSession]
    val identityCols = partitionSpec.collect {
      case PartitionTransforms.Identity(c) => c
    }
    val fileSchema =
      StructType(schema.filterNot(f => identityCols.contains(f.name)))
    require(fileSchema.nonEmpty, "cannot write a table that is ALL partition columns")
    // the zone days() derives in: the table's pinned zone, else the
    // session zone captured HERE on the driver (executors must not read
    // their own local session conf)
    val zone = partitionZone.getOrElse(
      org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    val fac = ParquetUtils.prepareWrite(cs.sessionState.conf, job, fileSchema,
      new ParquetOptions(Map.empty[String, String], cs.sessionState.conf))
    val conf = new SerializableConfiguration(job.getConfiguration)
    new Write with BatchWrite with RequiresDistributionAndOrdering { self =>
      override def toBatch: BatchWrite = self
      override def requiredDistribution: Distribution =
        if (partitionSpec.nonEmpty) Distributions.clustered(
          // cluster on the SOURCE columns: identity dirs colocate
          // exactly; transform dirs colocate because equal sources
          // derive equal dir values (a superset partitioning)
          partitionSpec.map(t => Expressions.identity(t.source)).toArray)
        else if (orderCols.nonEmpty)
          // declared sort order (r18): range-distribute so files are
          // range-DISJOINT, not just internally sorted
          Distributions.ordered(orderCols.map(c =>
            Expressions.sort(Expressions.identity(c),
              org.apache.spark.sql.connector.expressions.SortDirection
                .ASCENDING)).toArray)
        else Distributions.unspecified()
      override def requiredOrdering: Array[SortOrder] =
        // per-task sort on (partition sources, declared order): each
        // written file is internally sorted so its footer stats prune
        ((if (orderCols.isEmpty) Nil
          else partitionSpec.map(_.source)) ++ orderCols).distinct
          .map(c => Expressions.sort(Expressions.identity(c),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING): SortOrder).toArray
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        ParquetWriterFactory(fac, conf, schema, partitionSpec, zone,
          stagingDir)
      override def commit(msgs: Array[WriterCommitMessage]): Unit =
        onCommit(msgs.toSeq.flatMap {
          case Staged(p) => Seq(p)
          case StagedMany(ps) => ps
          case _ => Nil
        })
      override def abort(msgs: Array[WriterCommitMessage]): Unit =
        onAbort(msgs.toSeq.flatMap {
          case Staged(p) => Seq(p)
          case StagedMany(ps) => ps
          case _ => Nil
        })
    }
  }

  /** Render one partition value as its hive path fragment (escaped the
    * way Spark's dynamic partition writes do, so read-side inference
    * round-trips). */
  private def partFragment(name: String, dt: DataType, row: InternalRow,
      ord: Int, zone: String): String = {
    val v: String =
      if (row.isNullAt(ord)) null
      else dt match {
        case StringType => row.getUTF8String(ord).toString
        case BooleanType => row.getBoolean(ord).toString
        case ByteType => row.getByte(ord).toString
        case ShortType => row.getShort(ord).toString
        case IntegerType => row.getInt(ord).toString
        case LongType => row.getLong(ord).toString
        case DateType =>
          java.time.LocalDate.ofEpochDay(row.getInt(ord)).toString
        case TimestampType =>
          // rendered in the table's PINNED zone with Spark's own
          // fraction formatter — byte-identical to the V1 path's
          // Cast(ts, StringType, zone), so read-side inference and the
          // hive dir layout agree across sessions (r18)
          org.apache.spark.sql.catalyst.util.TimestampFormatter
            .getFractionFormatter(java.time.ZoneId.of(zone))
            .format(row.getLong(ord))
        case other => throw new UnsupportedOperationException(
          s"partition column $name: unsupported partition type $other")
      }
    // NULL *and* empty string both render as the default-partition dir,
    // matching ExternalCatalogUtils.getPartitionPathString — a 'col='
    // fragment would trip Spark's read-side partition inference
    // ("Empty partition column value") and make the table unreadable.
    val frag =
      if (v == null || v.isEmpty) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
      else ExternalCatalogUtils.escapePathName(v)
    ExternalCatalogUtils.escapePathName(name) + "=" + frag
  }

  final case class ParquetWriterFactory(fac: OutputWriterFactory,
      conf: SerializableConfiguration, schema: StructType,
      partitionSpec: Seq[PartitionTransforms.T], zone: String,
      stagingDir: String) extends DataWriterFactory {

    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] = {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
          TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt)
      val ctx = new TaskAttemptContextImpl(conf.value, attempt)
      val identityCols = partitionSpec.collect {
        case PartitionTransforms.Identity(c) => c
      }
      val fileSchema =
        StructType(schema.filterNot(f => identityCols.contains(f.name)))
      val hidden = partitionSpec.filterNot(_.isIdentity)

      final class WEntry(val w: OutputWriter, val path: String) {
        var n = 0L
      }
      new DataWriter[InternalRow] {
        private var closed = false
        // one open writer per partition dir this task touches;
        // "" = unpartitioned
        private val writers = mutable.LinkedHashMap.empty[String, WEntry]
        // Group-based ReplaceData (MERGE) prepends a `__row_operation`
        // int column that ReplaceDataExec only strips when the operation
        // declares metadata attributes (DataAndMetadataWritingSparkTask);
        // with none, DataWritingSparkTask hands the raw row through. Set
        // up once from the first row's arity: offset 0 when it matches
        // the write schema, 1 when the op column leads (DELETE-op rows
        // are skipped — COW replacement data must not contain them).
        private var offset = -1
        private var dataProj: UnsafeProjection = _
        // hidden-transform dir values, computed per row through ONE
        // codegen'd projection (spec order over the non-identity specs)
        private var derivedProj: UnsafeProjection = _
        private var derivedTypes: Array[DataType] = _
        // per-spec-entry fragment plan, precomputed once: (dirName,
        // value type, ordinal, fromDerived) — the write loop must not
        // do per-row field lookups
        private var fragPlan: Array[(String, DataType, Int, Boolean)] = _

        private def setup(r: InternalRow): Unit = {
          offset =
            if (r.numFields == schema.length) 0
            else if (r.numFields == schema.length + 1) 1
            else throw new IllegalStateException(
              s"row has ${r.numFields} fields for write schema ${schema.simpleString}")
          val dataIdx = schema.fields.zipWithIndex
            .filterNot { case (f, _) => identityCols.contains(f.name) }
          dataProj = UnsafeProjection.create(
            dataIdx.map { case (f, i) =>
              BoundReference(i + offset, f.dataType, f.nullable)
            }.toIndexedSeq)
          if (hidden.nonEmpty) {
            // the SAME catalyst shapes the V1 write and the prune
            // path evaluate — one derivation, zero parity risk
            val exprs = hidden.map { t =>
              val i = schema.fieldIndex(t.source)
              PartitionTransforms.deriveCatalyst(t, BoundReference(
                i + offset, schema.fields(i).dataType, nullable = true),
                Some(zone))
            }
            derivedProj = UnsafeProjection.create(exprs.toIndexedSeq)
            derivedTypes = exprs.map(_.dataType).toArray
          }
          var hi = -1
          fragPlan = partitionSpec.map {
            case PartitionTransforms.Identity(c) =>
              (c, schema(c).dataType, schema.fieldIndex(c) + offset, false)
            case t =>
              hi += 1
              (t.dirName, derivedTypes(hi), hi, true)
          }.toArray
        }

        override def write(r: InternalRow): Unit = {
          if (offset == -1) setup(r)
          if (offset == 1 && r.getInt(0) ==
              org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION)
            return
          val rel =
            if (partitionSpec.isEmpty) ""
            else {
              val derived = if (hidden.isEmpty) null else derivedProj(r)
              fragPlan.iterator.map { case (name, dt, ord, fromDerived) =>
                partFragment(name, dt, if (fromDerived) derived else r, ord,
                  zone)
              }.mkString("/")
            }
          val entry = writers.getOrElseUpdate(rel, {
            val dir = if (rel.isEmpty) stagingDir else s"$stagingDir/$rel"
            java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
            val path = f"$dir/part-$partitionId%05d-${UUID.randomUUID()}.parquet"
            new WEntry(fac.newInstance(path, fileSchema, ctx), path)
          })
          entry.w.write(dataProj(r))
          entry.n += 1
        }

        override def commit(): WriterCommitMessage = {
          closeOnce()
          val kept = writers.values.toSeq.flatMap { e =>
            if (e.n == 0L) {
              java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path))
              None
            } else Some(e.path)
          }
          if (kept.isEmpty) StagedEmpty
          else if (kept.lengthCompare(1) == 0) Staged(kept.head)
          else StagedMany(kept)
        }

        // Delete the partial files on abort: a retried task's first
        // attempt must leave nothing a later commit could publish.
        override def abort(): Unit = {
          closeOnce()
          writers.values.foreach(e =>
            java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(e.path)))
        }
        override def close(): Unit = closeOnce()
        private def closeOnce(): Unit = if (!closed) {
          closed = true
          writers.values.foreach(_.w.close())
        }
      }
    }
  }
}
