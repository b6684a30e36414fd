package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Iceberg-style metadata table: `SELECT * FROM cat.ns.t.snapshots` lists
  * the table's commit log (version, commit time, file/row-less stats).
  * Snapshot metadata is O(commits) and driver-local, so this is a
  * `LocalScan` — no executors, no files opened. */
class SnapshotsTable(fullName: String, tableDir: Path) extends Table with SupportsRead {

  private val schemaDef = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("n_files", IntegerType, nullable = false),
    StructField("total_bytes", LongType, nullable = false)))

  override def name(): String = fullName
  override def schema(): StructType = schemaDef
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schemaDef
        override def rows(): Array[InternalRow] =
          Snapshots.list(tableDir).map { s =>
            val bytes = s.files.map { f =>
              val p = tableDir.resolve(f)
              if (java.nio.file.Files.exists(p)) java.nio.file.Files.size(p) else 0L
            }.sum
            new GenericInternalRow(Array[Any](
              s.version, s.tsMillis * 1000L, s.files.length, bytes))
          }.toArray
      }
    }
}
