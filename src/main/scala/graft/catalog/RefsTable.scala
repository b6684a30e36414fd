package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style metadata table: `SELECT * FROM cat.ns.t.refs` lists the
  * table's named refs — TAG rows ([[Snapshots.createTag]]: name, pinned
  * version, creation time) and BRANCH rows ([[Snapshots.createBranch]]:
  * name, FORK version, creation time). Ref metadata is O(refs) and
  * driver-local → `LocalScan`, same as [[SnapshotsTable]]. */
class RefsTable(fullName: String, tableDir: Path) extends Table with SupportsRead {

  private val schemaDef = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))

  override def name(): String = fullName
  override def schema(): StructType = schemaDef
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schemaDef
        override def rows(): Array[InternalRow] = {
          def row(r: Snapshots.Ref, kind: String): InternalRow =
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(r.name), UTF8String.fromString(kind),
              r.version, r.tsMillis * 1000L))
          (Snapshots.tags(tableDir).map(row(_, "TAG")) ++
            Snapshots.branches(tableDir).map(row(_, "BRANCH"))).toArray
        }
      }
    }
}
