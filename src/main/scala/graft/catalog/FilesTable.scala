package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style `cat.ns.t.files` metadata table: the CURRENT snapshot's
  * data files with size and footer row count — what an operator (or a
  * human) reads to decide compaction/skew questions without scanning
  * data. File metadata is O(current files) and driver-local, so like
  * [[SnapshotsTable]] this is a `LocalScan`; the per-file record count
  * comes from the parquet footer ([[ParquetStats.rowCount]]), not a data
  * read. */
class FilesTable(fullName: String, tableDir: Path) extends Table with SupportsRead {

  private val schemaDef = StructType(Seq(
    StructField("content", StringType, nullable = false),
    StructField("file_path", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("snapshot_version", LongType, nullable = false)))

  override def name(): String = fullName
  override def schema(): StructType = schemaDef
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schemaDef
        override def rows(): Array[InternalRow] =
          Snapshots.latest(tableDir).toSeq.flatMap { s =>
            val conf = org.apache.spark.sql.SparkSession.active
              .sparkContext.hadoopConfiguration
            val stats = ParquetStats.footerStats(tableDir, s.files, conf)
            s.files.map { f =>
              val (rows, bytes) = stats(f)
              // Iceberg-parity `content` kind: MOR sidecars report as
              // position-deletes (record count = (file, pos) pairs) or
              // equality-deletes (record count = key tuples)
              val content =
                if (Snapshots.isEqualityDeleteFile(f)) "equality-deletes"
                else if (Snapshots.isDeleteFile(f)) "position-deletes"
                else "data"
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(content),
                UTF8String.fromString(f), bytes, rows, s.version))
            }
          }.toArray
      }
    }
}
