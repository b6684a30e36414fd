package graft.catalog

import java.nio.file.Path

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Position-delete sidecars — the merge-on-read half of the catalog's
  * row-level operations (Iceberg v2 position deletes,
  * `write.delete.mode='merge-on-read'`; the reference's tables get the
  * copy-on-write mode from `datafusion_iceberg`, Cargo.lock:1341 — MOR is
  * the scale extension a 100 TB dedup pipeline needs: a DELETE of 0.1% of
  * rows commits O(matched rows) of (file, pos) pairs instead of
  * rewriting every touched data file).
  *
  * A delete file is an ordinary parquet file under `<table>/deletes/`
  * with schema `(file STRING, pos BIGINT)`: `file` is the
  * tableDir-relative path of a data file, `pos` the 0-based row position
  * within that file (the parquet reader's absolute row index — stable
  * under column pruning, predicate pushdown and splits). Delete files
  * ride in the snapshot file list with their `deletes/` prefix
  * ([[Snapshots.Snap.deleteFiles]]), so expiry liveness, time travel and
  * WAP branching cover them with no extra bookkeeping. They are
  * immutable; positions referencing data files no longer in a snapshot
  * are ignored, and compaction ([[Maintenance.compact]]) folds deletes
  * into rewritten data files and drops the sidecars.
  *
  * Scale contract: delete files are SMALL BY CONSTRUCTION (a big delete
  * belongs in copy-on-write mode, which rewrites instead of masking), so
  * scans apply them via one driver-built, broadcast position index. The
  * index size is guarded by `graft.mor.broadcastMaxBytes` (8 bytes per
  * position) — past it, reads fail loudly advising compaction, rather
  * than silently OOMing the driver. */
object DeleteSidecars {

  /** On-disk schema of a position-delete file. */
  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("pos", LongType, nullable = false)))

  val BroadcastMaxBytesKey = "graft.mor.broadcastMaxBytes"
  val BroadcastMaxBytesDefault: Long = 128L * 1024 * 1024

  /** The scan-side position index: data-file relative path → sorted,
    * de-duplicated 0-based row positions. Driver-local parquet reads
    * (delete files are small by contract); total position count guarded
    * by [[BroadcastMaxBytesKey]]. */
  def loadIndex(tableDir: Path, deleteFiles: Seq[String],
      conf: Configuration, maxBytes: Long): Map[String, Array[Long]] = {
    val acc = mutable.Map.empty[String, mutable.ArrayBuffer[Long]]
    var positions = 0L
    deleteFiles.foreach { rel =>
      val abs = new org.apache.hadoop.fs.Path(tableDir.resolve(rel).toString)
      val reader = ParquetReader.builder(new GroupReadSupport(), abs)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val f = g.getString("file", 0)
          val p = g.getLong("pos", 0)
          acc.getOrElseUpdate(f, mutable.ArrayBuffer.empty) += p
          positions += 1
          if (positions * 8L > maxBytes) throw new IllegalStateException(
            s"merge-on-read position index for $tableDir exceeds " +
              s"$BroadcastMaxBytesKey=$maxBytes bytes " +
              s"(${deleteFiles.length} delete files); run " +
              "CALL <cat>.system.compact(...) to fold deletes into data " +
              "files, or raise the limit")
          g = reader.read()
        }
      } finally reader.close()
    }
    acc.view.mapValues(_.distinct.sorted.toArray).toMap
  }

  /** The exact URI string Spark's `_metadata.file_path` reports for a
    * local file: scheme + ':' + percent-encoded path, with NO `//`
    * authority marker when the authority is absent (Hadoop `Path`
    * normalization — `java.nio.Path.toUri` would render `file:///...`,
    * which does NOT string-match). Centralized so every (file, pos)
    * join in the MOR machinery keys on one encoding. */
  def sparkFileUri(p: Path): String = {
    val u = p.toUri
    val auth = Option(u.getRawAuthority).filter(_.nonEmpty)
      .map("//" + _).getOrElse("")
    u.getScheme + ":" + auth + u.getRawPath
  }

  /** All (file, pos) pairs of the given delete files as a DataFrame —
    * the distributed consumer path (compaction, upsert, changelog).
    * Distinct: several DELETEs may have recorded the same position. */
  def positionsDf(spark: SparkSession, tableDir: Path,
      deleteFiles: Seq[String]): DataFrame = {
    if (deleteFiles.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    spark.read.schema(schema)
      .parquet(deleteFiles.map(f => tableDir.resolve(f).toString): _*)
      .distinct()
  }

  /** Anti-join a data-file read against position deletes. `df` must be a
    * V1 `spark.read.parquet` frame over files of `dataFiles` (so
    * `_metadata.file_path` / `_metadata.row_index` resolve); rows whose
    * (file, position) appear in `deleteFiles` drop. The file-identity
    * join key is the ABSOLUTE URI: relative paths map driver-side
    * through the same `Path.toUri` both sides use, so hive partition
    * dirs with url-encoded values stay matched. Positions load through
    * [[loadIndex]], so the SAME [[BroadcastMaxBytesKey]] guard that
    * protects interactive scans protects these driver-side
    * materializations (COW-fallback DELETE, upsert, changelog) — over
    * the cap they fail with the compact-advising error, never a silent
    * driver OOM. */
  def applyDeletes(df: DataFrame, spark: SparkSession, tableDir: Path,
      dataFiles: Seq[String], deleteFiles: Seq[String]): DataFrame = {
    // no sidecars, or no data files (df is then a plain empty frame
    // with no `_metadata` to join on): nothing to mask
    if (deleteFiles.isEmpty || dataFiles.isEmpty) return df
    val maxBytes = spark.conf.getOption(BroadcastMaxBytesKey)
      .map(_.toLong).getOrElse(BroadcastMaxBytesDefault)
    val index = loadIndex(tableDir, deleteFiles,
      spark.sparkContext.hadoopConfiguration, maxBytes)
    val relToUri = dataFiles.map(rel =>
      rel -> sparkFileUri(tableDir.resolve(rel))).toMap
    val posUri = index.toSeq.flatMap { case (rel, positions) =>
      relToUri.get(rel).toSeq.flatMap(u => positions.map(p => (u, p)))
    }
    val dels = spark.createDataFrame(posUri).toDF("__uri", "__pos")
    df.join(broadcast(dels),
      col("_metadata.file_path") === col("__uri") &&
        col("_metadata.row_index") === col("__pos"),
      "left_anti")
  }
}
