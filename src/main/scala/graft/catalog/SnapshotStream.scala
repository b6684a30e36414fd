package graft.catalog

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Snapshot-log-driven streaming source for MetaCatalog tables: the
  * stream offset IS the snapshot version, and a micro-batch delivers
  * exactly the data files the commits (start, end] added. Compared to a
  * raw file glob (the previous implementation) this closes two holes:
  *
  *  - files are visible to a glob the moment they are moved into `data/`,
  *    BEFORE their snapshot commits — a crash in that window would stream
  *    rows the table never committed. Here, uncommitted files simply
  *    never appear in any snapshot's file list.
  *  - a DELETE / INSERT OVERWRITE / compaction after stream start
  *    rewrites survivors into new files, which a glob re-delivers as
  *    brand-new rows (silent duplicates). Here, every batch re-validates
  *    append-only delivery and FAILS the stream when a snapshot in the
  *    batch range dropped files.
  *
  * At 100 TB this is the same planning shape as an Iceberg incremental
  * read: one metadata read per trigger (the snapshot log), then a scan of
  * only the newly committed files — never a directory listing of the
  * whole table.
  */
final class SnapshotStreamSource(
    spark: SparkSession, tableDir: Path, override val schema: StructType)
    extends Source {

  private def version(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  private def filesAt(v: Long): Set[String] =
    if (v <= 0L) Set.empty
    else Snapshots.byVersion(tableDir, v).map(_.files.toSet).getOrElse(
      throw new IllegalStateException(
        s"snapshot v$v of $tableDir is gone (expired while a stream was reading it?)"))

  override def getOffset: Option[OffsetV1] =
    Snapshots.latest(tableDir).map(s => LongOffset(s.version))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val startV = start.map(version).getOrElse(0L)
    val endV = version(end)
    val startFiles = if (startV <= 0L) Set.empty[String] else filesAt(startV)
    // validate EVERY snapshot in the batch range, not just its endpoints:
    // an add+rewrite committed between two triggers would otherwise slip
    // through (the dropped file cancels out of the endpoint diff) even
    // though the table violated its append-only streaming contract
    var prev = startFiles
    Snapshots.list(tableDir)
      .filter(s => s.version > startV && s.version <= endV)
      .foreach { s =>
        val cur = s.files.toSet
        val dropped = prev -- cur
        require(dropped.isEmpty,
          s"table at $tableDir had a non-append commit while streaming " +
            s"(snapshot v${s.version} drops ${dropped.size} file(s)); " +
            "streaming reads require append-only commits")
        prev = cur
      }
    val endFiles = filesAt(endV)
    val fresh = (endFiles -- startFiles).toSeq.sorted
      .map(f => tableDir.resolve(f).toUri.toString)
    org.apache.spark.sql.graftaccess.Internals
      .streamingParquetDf(spark, schema, fresh)
  }

  override def stop(): Unit = ()

  override def toString: String = s"SnapshotStreamSource[$tableDir]"
}

/** V1 stream-source provider wiring for [[SnapshotStreamSource]]
  * (`spark.readStream.format(...).option("tableDir", dir)`). */
final class SnapshotStreamProvider
    extends StreamSourceProvider with DataSourceRegister {

  override def shortName: String = "graft-snapshots"

  private def dirOf(parameters: Map[String, String]): Path =
    java.nio.file.Paths.get(parameters.getOrElse("tableDir",
      throw new IllegalArgumentException("option tableDir is required")))

  override def sourceSchema(
      ctx: SQLContext, schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    dirOf(parameters) // validate eagerly
    (shortName, schema.getOrElse(throw new IllegalArgumentException(
      "an explicit .schema(...) is required")))
  }

  override def createSource(
      ctx: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source =
    new SnapshotStreamSource(ctx.sparkSession, dirOf(parameters), schema.get)
}
