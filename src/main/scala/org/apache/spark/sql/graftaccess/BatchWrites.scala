package org.apache.spark.sql.graftaccess

import java.util.UUID

import org.apache.hadoop.mapreduce.{Job, JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.{ParquetOptions, ParquetUtils}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

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
  * writer one file; on a real cluster the staging dir must be on the
  * shared filesystem — it lives under the table directory, which is).
  * The driver-side `commit` gets the staged file paths and runs the
  * caller's snapshot-commit callback; `abort` hands back whatever was
  * staged for cleanup.
  */
object BatchWrites {

  final case class Staged(path: String) extends WriterCommitMessage
  /** A writer that saw no rows: its file is deleted at task commit and
    * nothing publishes — empty shuffle partitions of a narrow MERGE must
    * not inflate the snapshot's file inventory with zero-row parquet. */
  case object StagedEmpty extends WriterCommitMessage

  def parquetWrite(spark: SparkSession, schema: StructType,
      stagingDir: String, onCommit: Seq[String] => Unit,
      onAbort: Seq[String] => Unit): Write = {
    val cs = spark.asInstanceOf[ClassicSession]
    val job = Job.getInstance(cs.sessionState.newHadoopConf())
    val fac = ParquetUtils.prepareWrite(cs.sessionState.conf, job, schema,
      new ParquetOptions(Map.empty[String, String], cs.sessionState.conf))
    val conf = new SerializableConfiguration(job.getConfiguration)
    new Write with BatchWrite { self =>
      override def toBatch: BatchWrite = self
      override def createBatchWriterFactory(
          info: PhysicalWriteInfo): DataWriterFactory =
        ParquetWriterFactory(fac, conf, schema, stagingDir)
      override def commit(msgs: Array[WriterCommitMessage]): Unit =
        onCommit(msgs.toSeq.collect { case Staged(p) => p })
      override def abort(msgs: Array[WriterCommitMessage]): Unit =
        onAbort(msgs.toSeq.collect { case Staged(p) => p })
    }
  }

  final case class ParquetWriterFactory(fac: OutputWriterFactory,
      conf: SerializableConfiguration, schema: StructType,
      stagingDir: String) extends DataWriterFactory {
    override def createWriter(partitionId: Int,
        taskId: Long): DataWriter[InternalRow] = {
      val attempt = new TaskAttemptID(
        new TaskID(new JobID(UUID.randomUUID().toString.take(8), 0),
          TaskType.MAP, partitionId),
        (taskId % Int.MaxValue).toInt)
      val ctx = new TaskAttemptContextImpl(conf.value, attempt)
      val path =
        f"$stagingDir/part-$partitionId%05d-${UUID.randomUUID()}.parquet"
      val w = fac.newInstance(path, schema, ctx)
      new DataWriter[InternalRow] {
        private var closed = false
        private var written = 0L
        // Group-based ReplaceData (MERGE) prepends a `__row_operation`
        // int column that ReplaceDataExec only strips when the operation
        // declares metadata attributes (DataAndMetadataWritingSparkTask);
        // with none, DataWritingSparkTask hands the raw row through. Set
        // up once from the first row's arity: pass-through when it
        // matches the write schema, else skip DELETE-op rows (COW
        // replacement data must not contain them) and project the op
        // column away.
        private var opCol = -2 // -2 = undecided, -1 = none, 0 = present
        private var proj: org.apache.spark.sql.catalyst.expressions.UnsafeProjection = _
        override def write(r: InternalRow): Unit = {
          if (opCol == -2) {
            if (r.numFields == schema.length) opCol = -1
            else if (r.numFields == schema.length + 1) {
              opCol = 0
              proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
                .create(schema.fields.zipWithIndex.map { case (f, i) =>
                  org.apache.spark.sql.catalyst.expressions.BoundReference(
                    i + 1, f.dataType, f.nullable)
                }.toIndexedSeq)
            } else throw new IllegalStateException(
              s"row has ${r.numFields} fields for write schema ${schema.simpleString}")
          }
          if (opCol == -1) { w.write(r); written += 1 }
          else if (r.getInt(0) !=
            org.apache.spark.sql.catalyst.util.RowDeltaUtils.DELETE_OPERATION) {
            w.write(proj(r)); written += 1
          }
        }
        override def commit(): WriterCommitMessage = {
          closeOnce()
          if (written == 0L) {
            java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
            StagedEmpty
          } else Staged(path)
        }
        // Delete the partial file on abort: a retried task's first
        // attempt must leave nothing a later commit could publish.
        override def abort(): Unit = {
          closeOnce()
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
        }
        override def close(): Unit = closeOnce()
        private def closeOnce(): Unit = if (!closed) { closed = true; w.close() }
      }
    }
  }
}
