package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style `cat.ns.t.partitions` metadata table: per-partition
  * file and (footer) row counts for the CURRENT snapshot — the skew /
  * compaction-planning view ("which partition has 40k tiny files")
  * answered from metadata, never a data scan. The partition identity is
  * the hive-style directory chain under data/ (`lang=en/year=2024`);
  * unpartitioned tables report ONE row with the empty-string partition.
  * O(current files) and driver-local, like [[FilesTable]]. */
class PartitionsTable(fullName: String, tableDir: Path)
    extends Table with SupportsRead {

  private val schemaDef = StructType(Seq(
    StructField("partition", StringType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  override def name(): String = fullName
  override def schema(): StructType = schemaDef
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new LocalScan {
        override def readSchema(): StructType = schemaDef
        override def rows(): Array[InternalRow] = {
          val conf = org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration
          Snapshots.latest(tableDir).toSeq.flatMap { s =>
            // data files only: MOR sidecars live flat under deletes/
            // and have no partition identity
            val stats = ParquetStats.footerStats(tableDir, s.dataFiles, conf)
            s.dataFiles.groupBy { f =>
              // data/<partition dirs>/<file>: the partition identity is
              // everything between data/ and the file name
              val rel = f.stripPrefix("data/")
              val cut = rel.lastIndexOf('/')
              if (cut < 0) "" else rel.substring(0, cut)
            }.toSeq.sortBy(_._1).map { case (part, files) =>
              val (rows, bytes) = files.foldLeft((0L, 0L)) { case ((r, b), f) =>
                val (fr, fb) = stats(f)
                (r + fr, b + fb)
              }
              new GenericInternalRow(Array[Any](
                UTF8String.fromString(part), files.length.toLong,
                rows, bytes)): InternalRow
            }
          }.toArray
        }
      }
    }
}
