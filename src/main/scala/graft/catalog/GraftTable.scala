package graft.catalog

import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.{InsertableRelation, Filter}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Snapshot-aware catalog table: the Spark-side rebuild of the reference's
  * Iceberg TableProvider surface (`datafusion_iceberg`, Cargo.lock:1341-1343,
  * registered at iceberg-datafusion-arrow-flight/src/lib.rs:94-98).
  *
  * Reads delegate to Spark's native DSv2 `ParquetTable` over the PINNED
  * snapshot's file list, so scans keep the whole Parquet stack (column
  * pruning, predicate pushdown, row-group pruning, vectorized reader) and
  * time travel costs one metadata read. Writes go through the V1
  * `InsertableRelation` fallback — still a fully distributed `df.write`,
  * but with commit control: files land under `data/` (hive-layout dirs for
  * identity-partitioned tables), then one snapshot append makes them
  * visible. DELETE is copy-on-write: survivors are rewritten and the new
  * snapshot references only them, old files stay for time travel — the
  * same contract Iceberg's copy-on-write DELETE gives a 1000-executor
  * cluster (at 100 TB the refinement is file-level pruning via column
  * stats so only files containing matches rewrite; semantics identical).
  */
class GraftTable(
    fullName: String,
    tableDir: Path,
    declaredSchema: StructType,
    partitionCols: Seq[String],
    props: Map[String, String],
    pinned: Option[Snapshots.Snap],
    branch: Option[String] = None) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete
    with SupportsRowLevelOperations with SupportsMetadataColumns {

  private def spark: SparkSession = SparkSession.active
  private def dataDir: Path = tableDir.resolve("data")

  /** The snapshot this handle reads and writes against: the pinned
    * time-travel snapshot, the branch head (WAP staging), or main's
    * latest. A branch handle whose ref vanished mid-use fails loudly
    * rather than silently reading main. */
  private def headSnap: Option[Snapshots.Snap] = pinned.orElse(branch match {
    case Some(b) => Some(Snapshots.branchHead(tableDir, b).getOrElse(
      throw new IllegalStateException(
        s"branch '$b' of $fullName no longer exists")))
    case None => Snapshots.latest(tableDir)
  })

  /** Commit the next snapshot of THIS handle's lineage: the branch's
    * private log for a WAP staging handle, the main log otherwise. */
  private def commitVisible(
      compute: Option[Snapshots.Snap] => Seq[String]): Snapshots.Snap =
    branch match {
      case Some(b) => Snapshots.commitToBranch(tableDir, b)(compute)
      case None => Snapshots.commitWith(tableDir)(compute)
    }

  /** Visible data files (absolute paths) for this table handle. */
  private def visibleFiles: Seq[String] = {
    val snap = headSnap
    val rel = snap match {
      case Some(s) => s.files
      case None => // pre-snapshot (v1-era) table: whole data dir
        Snapshots.walkDataParquet(tableDir)
    }
    rel.map(f => tableDir.resolve(f).toString)
  }

  private def readDelegate: ParquetTable = delegateFor(visibleFiles)

  private def delegateFor(files: Seq[String]): ParquetTable = {
    // Empty snapshot (fresh table, TRUNCATE, or time travel to v1): scan a
    // dedicated empty dir — scanning data/ would leak files committed by
    // LATER snapshots into the pinned view.
    val paths = if (files.nonEmpty) files else {
      val empty = dataDir.resolve("_graft_empty") // under basePath; underscore
      Files.createDirectories(empty)              // dirs are invisible to scans
      Seq(empty.toString)
    }
    // basePath keeps hive-style partition-dir inference rooted at data/
    // even though we hand the index leaf files, not the directory.
    val opts = new CaseInsensitiveStringMap(
      Map("basePath" -> dataDir.toString).asJava)
    ParquetTable(fullName, spark, opts, paths,
      Some(declaredSchema), classOf[ParquetFileFormat])
  }

  override def name(): String = fullName
  override def schema(): StructType = declaredSchema
  override def columns(): Array[Column] = declaredSchema.fields.map(f =>
    Column.create(f.name, f.dataType, f.nullable))
  override def partitioning(): Array[Transform] =
    partitionCols.map(c => Expressions.identity(c)).toArray
  override def properties(): java.util.Map[String, String] = {
    val snapInfo = headSnap
      .map(s => Map("graft.current-snapshot-id" -> s.version.toString))
      .getOrElse(Map.empty)
    (props ++ snapInfo + ("provider" -> "parquet")).asJava
  }

  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  // --- read -------------------------------------------------------------

  /** A real data column named `_file` shadows the metadata column
    * (Spark resolves metadata columns LAST, but this table's scan
    * wrapper keys on the name — safest to disable the path entirely and
    * serve the data column untouched). */
  private def fileColShadowed: Boolean = declaredSchema.fieldNames
    .contains(org.apache.spark.sql.graftaccess.FileTaggedScans.FileCol)

  /** `_file` (Iceberg-parity): the absolute path of the data file each
    * row was read from. Served by
    * [[org.apache.spark.sql.graftaccess.FileTaggedScans]] — queries that
    * don't reference it keep the untouched delegate plan. */
  override def metadataColumns(): Array[MetadataColumn] =
    if (fileColShadowed) Array.empty
    else Array(
      new MetadataColumn {
        override def name(): String =
          org.apache.spark.sql.graftaccess.FileTaggedScans.FileCol
        override def dataType(): org.apache.spark.sql.types.DataType =
          org.apache.spark.sql.types.StringType
        override def isNullable: Boolean = false
        override def comment(): String =
          "absolute path of the data file the row was read from"
      })

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val delegate = readDelegate.newScanBuilder(options)
    if (fileColShadowed) delegate
    else new org.apache.spark.sql.graftaccess.FileTaggedScans.Builder(delegate)
  }

  // --- write (V1 fallback: full commit control, still distributed) ------

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    if (pinned.isDefined)
      throw new UnsupportedOperationException(
        s"Cannot write to time-travel snapshot of $fullName")
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwriteFlag: Boolean): Unit =
              commitWrite(data, overwrite || overwriteFlag)
          }
      }
    }
  }

  /** Distributed write into a scratch dir, then move data files under
    * `data/` (preserving partition-dir structure) and append one snapshot.
    * Spark part-file names embed a per-job UUID, so moves never collide. */
  /** `replacedBase`: the snapshot file list a rewrite (DELETE) was
    * computed FROM — the commit replaces exactly those files and keeps
    * anything committed since, so a concurrent INSERT between the
    * rewrite's read and its commit survives. `overwrite` without a base
    * (INSERT OVERWRITE / TRUNCATE) replaces the whole visible set by
    * request. */
  private def commitWrite(data: DataFrame, overwrite: Boolean,
      replacedBase: Option[Seq[String]] = None): Unit = {
    val tmp = Files.createTempDirectory(s"graft_commit_${UUID.randomUUID().toString.take(8)}")
    try {
      val aligned = data.toDF(declaredSchema.fieldNames.toSeq: _*)
      val w = aligned.write.mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
      // The V1 writer emits a zero-row part file for an empty frame (a
      // rewrite whose pruned files left no survivors). Committing it
      // would inflate every later snapshot's file inventory — Iceberg
      // skips empty files; so do we. Footer reads are bounded by the
      // rewrite's own output size.
      scala.util.Using.resource(Files.walk(tmp)) { st =>
        st.iterator().asScala
          .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
          .filter(p => ParquetStats.rowCount(p.toString) == 0L)
          .toList.foreach(Files.deleteIfExists(_))
      }
      publishAndCommit(tmp, overwrite, replacedBase)
    } finally {
      if (Files.exists(tmp)) {
        scala.util.Using.resource(Files.walk(tmp)) { st =>
          st.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
        }
      }
    }
  }

  /** Move every parquet file under `tmp` into `data/` (preserving
    * partition-dir structure) and append ONE snapshot — read-latest +
    * conflict-validate + move + publish all under the commit lock (two
    * concurrent INSERTs reading `latest` outside it would lose the first
    * writer's files). `replacedBase` is the snapshot file list a rewrite
    * was computed FROM: the commit replaces exactly those files and keeps
    * anything committed since; a stale base (concurrent rewrite won)
    * aborts loudly, Iceberg-style, before any file moves. */
  private def publishAndCommit(tmp: Path, overwrite: Boolean,
      replacedBase: Option[Seq[String]],
      only: Option[Set[Path]] = None): Unit = {
    // The tmp→data move runs EXACTLY ONCE even though the CAS compute
    // closure can run several times: a commit that loses the
    // cross-process createLink race retries with a fresh `latest`, and
    // re-walking tmp on that retry would find NOTHING (the files moved
    // on attempt 1) — the snapshot would commit an empty append and the
    // write would be silently lost. tools/contend.sh caught exactly
    // this: two JVMs racing INSERTs dropped ~1 row in 16. (In ONE JVM
    // the casCommit monitor serializes commits, so the retry path never
    // ran and the hole was invisible to in-process tests.) A stale-base
    // abort AFTER the move leaves the moved files as snapshot-less
    // orphans in data/ — remove_orphan_files reclaims them, same as any
    // crashed write.
    var movedOnce: Option[Seq[String]] = None
    commitVisible { latest =>
      replacedBase.foreach { base =>
        val current = latest.map(_.files.toSet).getOrElse(Set.empty)
        val gone = base.filterNot(current.contains)
        if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
          s"$fullName: rewrite base is stale (files ${gone.take(3).mkString(", ")}" +
            s"${if (gone.length > 3) ", …" else ""} replaced by a concurrent " +
            "commit); retry the operation")
      }
      val moved = movedOnce.getOrElse {
        val m = scala.util.Using.resource(Files.walk(tmp)) { st =>
          st.iterator().asScala
            .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
            // `only`: publish just the task-committed files (V2 writes) —
            // stragglers from attempts that died without abort() must not
            // sneak into the snapshot
            .filter(p => only.forall(_.contains(p)))
            .map { p =>
              val rel = tmp.relativize(p)
              val dest = dataDir.resolve(rel)
              Files.createDirectories(dest.getParent)
              Files.move(p, dest)
              tableDir.relativize(dest).toString
            }.toSeq
        }
        movedOnce = Some(m)
        m
      }
      val prev = (overwrite, replacedBase) match {
        case (true, Some(base)) => // surgical rewrite: drop base only
          latest.map(_.files).getOrElse(Seq.empty).diff(base)
        case (true, None) => Seq.empty
        case _ => latest.map(_.files).getOrElse(Seq.empty)
      }
      prev ++ moved
    }
  }

  /** Rewrite the given base snapshot's files with `data` — surgical
    * (files committed since `baseFiles` survive; stale base aborts).
    * Maintenance.compact's entry point. */
  private[catalog] def replaceFiles(data: DataFrame, baseFiles: Seq[String]): Unit =
    commitWrite(data, overwrite = true, replacedBase = Some(baseFiles))

  // --- SQL row-level commands (MERGE INTO / UPDATE / subquery DELETE) ---

  /** Group-based (copy-on-write) row-level operation support: Spark's
    * `RewriteMergeIntoTable` / `RewriteUpdateTable` / subquery-DELETE
    * rewrites plan a `ReplaceData` over this operation's scan and write
    * the post-command table back through `Write.toBatch`
    * ([[org.apache.spark.sql.graftaccess.BatchWrites]] — ReplaceData has
    * no V1 fallback).
    *
    * The scan is pinned to the base snapshot captured when the operation
    * is created. It hides STATIC pushdown (in the group-based protocol
    * the write must replace exactly the groups the scan produced — a
    * filter the connector can't mirror into the replaced set would
    * silently drop rows) but implements RUNTIME group filtering at file
    * granularity: Spark feeds the command's matching key values back and
    * provably-unaffected files leave both the scan and the replaced set,
    * so a narrow MERGE rewrites O(matching files). [[Maintenance.upsert]]
    * remains the programmatic pruned-upsert path, and
    * translatable-predicate DELETEs still take the metadata-only
    * [[deleteWhere]] path (`OptimizeMetadataOnlyDeleteFromTable`). */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (pinned.isDefined)
      throw new UnsupportedOperationException(
        s"Cannot modify a time-travel snapshot of $fullName")
    // Note: Spark's RewriteDeleteFromTable matches
    // SupportsRowLevelOperations ahead of SupportsDeleteV2, so this
    // builder runs at ANALYSIS for every conditional DELETE;
    // translatable DELETEs are converted back to the metadata
    // [[deleteWhere]] path by OptimizeMetadataOnlyDeleteFromTable
    // before any write is built.
    () => new GraftRowLevelOperation(info.command)
  }

  private class GraftRowLevelOperation(
      cmd: org.apache.spark.sql.connector.write.RowLevelOperation.Command)
      extends org.apache.spark.sql.connector.write.RowLevelOperation {
    // Base snapshot pinned at operation creation. `replaced` is the
    // group set the commit swaps out: it starts as the whole base and
    // NARROWS when Spark's runtime group filtering proves files can't
    // contain matching rows (see GroupFilterScan) — the written data is
    // exactly the filtered scan's rows, so scan set and replaced set
    // stay in lockstep by construction.
    private val baseFiles: Seq[String] =
      headSnap.map(_.files).getOrElse(Seq.empty)
    @volatile private var replaced: Seq[String] = baseFiles

    override def command(): org.apache.spark.sql.connector.write.RowLevelOperation.Command = cmd

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new GroupFilterScan(options)

    /** Row-level scan with FILE-GRANULARITY runtime group filtering:
      * Spark's RowLevelOperationRuntimeGroupFiltering collects the
      * command's matching key values and calls [[filter]]; files whose
      * footer stats prove no row can match drop from BOTH the scan and
      * the replaced set — a narrow MERGE rewrites O(matching files), not
      * the table. STATIC pushdown stays hidden (a filter the connector
      * can't mirror into the replaced set would silently drop rows);
      * runtime filters are safe precisely because we apply them to the
      * group list ourselves. Untranslatable or non-stats-provable
      * predicates prune nothing — conservative. */
    private class GroupFilterScan(options: CaseInsensitiveStringMap)
        extends org.apache.spark.sql.connector.read.Scan
        with org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering {
      @volatile private var files: Seq[String] = baseFiles
      override def readSchema(): StructType = declaredSchema
      override def toBatch: org.apache.spark.sql.connector.read.Batch =
        delegateFor(files.map(f => tableDir.resolve(f).toString))
          .newScanBuilder(options).build().toBatch
      override def description(): String =
        s"graft-row-level($fullName, ${files.length}/${baseFiles.length} files)"
      // ONE attribute: exposing several makes Spark build a joint
      // named_struct(...) IN subquery runtime filter, which has no V1
      // translation — nothing would prune. Any single target column is
      // sound (the values come from the command's matched rows); the
      // leading column is the usual clustered merge key, overridable via
      // the `graft.rowlevel.filter-column` table property.
      override def filterAttributes()
          : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
        val chosen = props.getOrElse("graft.rowlevel.filter-column",
          declaredSchema.fieldNames.head)
        Array(org.apache.spark.sql.connector.expressions.Expressions.column(chosen))
      }
      override def filter(predicates: Array[
          org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
        val v1 = org.apache.spark.sql.graftaccess.Internals
          .predicatesToV1(predicates)
        if (v1.nonEmpty) {
          val conf = spark.sparkContext.hadoopConfiguration
          files = files.filter(f => ParquetStats.mayMatchAll(
            tableDir.resolve(f).toString, v1, conf) &&
            BloomSidecars.mayMatchAll(tableDir, f, v1))
          replaced = files
        }
      }
    }

    override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
      // Only reached when the command actually takes the ReplaceData
      // write path — translatable DELETEs on partitioned tables have
      // already been converted to metadata deleteWhere by this point.
      // Identity-partitioned tables route rows to hive-layout dirs in
      // the V2 writer (BatchWrites partitionCols), same on-disk contract
      // as the V1 partitionBy writes.
      val staging = tableDir.resolve(s"_staging_${UUID.randomUUID().toString.take(8)}")
      Files.createDirectories(staging)
      def dropStaging(): Unit =
        if (Files.exists(staging)) {
          scala.util.Using.resource(Files.walk(staging)) { st =>
            st.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala.foreach(Files.deleteIfExists(_))
          }
        }
      new WriteBuilder {
        override def build(): Write =
          org.apache.spark.sql.graftaccess.BatchWrites.parquetWrite(
            spark, info.schema(), staging.toString,
            // `replaced` read at COMMIT time — after any runtime group
            // filtering has narrowed it; only task-committed files
            // publish (retry stragglers stay behind and are dropped)
            onCommit = paths => try publishAndCommit(staging,
              overwrite = true, replacedBase = Some(replaced),
              only = Some(paths.map(p => java.nio.file.Paths.get(p)).toSet))
            finally dropStaging(),
            onAbort = _ => dropStaging(),
            partitionCols = partitionCols)
      }
    }
  }

  // --- DELETE (copy-on-write) ------------------------------------------

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    filters.forall(FilterToColumn.translate(_).isDefined)

  override def deleteWhere(filters: Array[Filter]): Unit = {
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    val cond = filters.flatMap(FilterToColumn.translate)
      .reduceOption(_ && _).getOrElse(lit(true))
    // One consistent base snapshot for BOTH the scan and the commit's
    // replaced-file set (reading them separately could straddle a
    // concurrent commit).
    val baseSnap = headSnap
    val baseFiles = baseSnap.map(_.files).getOrElse(Seq.empty)
    // FILE-LEVEL PRUNING: only files whose footer stats say the predicate
    // MIGHT match get rewritten; provably-unaffected files stay in place
    // (after compact() sorts on the predicate column, a key-range DELETE
    // over 100 TB rewrites O(1) files). Bloom sidecars additionally skip
    // point lookups over interleaved keys min/max can't separate.
    // Conservative: stats/sidecar missing → rewrite.
    val (touched, _) = baseFiles.partition(f =>
      ParquetStats.mayMatchAll(tableDir.resolve(f).toString, filters.toSeq,
        spark.sparkContext.hadoopConfiguration) &&
        BloomSidecars.mayMatchAll(tableDir, f, filters.toSeq))
    val absTouched = baseSnap match {
      case Some(_) => touched.map(f => tableDir.resolve(f).toString)
      case None => visibleFiles // pre-snapshot table: whole data dir
    }
    if (baseSnap.isDefined && touched.isEmpty) return // provably a no-op
    val survivors =
      if (absTouched.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declaredSchema)
      else spark.read
        .option("basePath", dataDir.toString)
        .schema(declaredSchema)
        .parquet(absTouched: _*)
        // DSv2 DELETE removes rows where the predicate is TRUE; a NULL
        // predicate (e.g. `a > 5` with a NULL) must KEEP the row — a bare
        // not(cond) is NULL there and filter() would silently drop it.
        .filter(not(coalesce(cond, lit(false))))
    commitWrite(survivors, overwrite = true,
      replacedBase = Some(if (baseSnap.isDefined) touched else baseFiles))
  }
}

/** DSv2 `sources.Filter` → `Column` translation for copy-on-write DELETE. */
private[catalog] object FilterToColumn {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.sources._

  def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r) => for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}
