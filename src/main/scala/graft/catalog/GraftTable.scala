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
    pinned: Option[Snapshots.Snap]) extends Table
    with SupportsRead with SupportsWrite with SupportsDelete {

  private def spark: SparkSession = SparkSession.active
  private def dataDir: Path = tableDir.resolve("data")

  /** Visible data files (absolute paths) for this table handle. */
  private def visibleFiles: Seq[String] = {
    val snap = pinned.orElse(Snapshots.latest(tableDir))
    snap match {
      case Some(s) => s.files.map(f => tableDir.resolve(f).toString)
      case None => // pre-snapshot (v1-era) table: whole data dir
        if (!Files.isDirectory(dataDir)) Seq.empty
        else scala.util.Using.resource(Files.walk(dataDir)) { st =>
          st.iterator().asScala
            .filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq
        }
    }
  }

  private def readDelegate: ParquetTable = {
    val files = visibleFiles
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
    val snapInfo = pinned.orElse(Snapshots.latest(tableDir))
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

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    readDelegate.newScanBuilder(options)

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
      // Read latest + move + publish under ONE lock — two concurrent
      // INSERTs reading `latest` outside it would lose the first
      // writer's files (lost update).
      Snapshots.commitWith(tableDir) { latest =>
        // Conflict validation BEFORE any file moves: a surgical rewrite
        // whose base files are no longer all current means a concurrent
        // rewrite won — committing anyway would duplicate survivors and
        // resurrect deleted rows. Fail loudly (Iceberg aborts the same
        // way); the caller retries against the new snapshot.
        replacedBase.foreach { base =>
          val current = latest.map(_.files.toSet).getOrElse(Set.empty)
          val gone = base.filterNot(current.contains)
          if (gone.nonEmpty) throw new java.util.ConcurrentModificationException(
            s"$fullName: rewrite base is stale (files ${gone.take(3).mkString(", ")}" +
              s"${if (gone.length > 3) ", …" else ""} replaced by a concurrent " +
              "commit); retry the operation")
        }
        val moved = scala.util.Using.resource(Files.walk(tmp)) { st =>
          st.iterator().asScala
            .filter(p => Files.isRegularFile(p) && p.toString.endsWith(".parquet"))
            .map { p =>
              val rel = tmp.relativize(p)
              val dest = dataDir.resolve(rel)
              Files.createDirectories(dest.getParent)
              Files.move(p, dest)
              tableDir.relativize(dest).toString
            }.toSeq
        }
        val prev = (overwrite, replacedBase) match {
          case (true, Some(base)) => // surgical rewrite: drop base only
            latest.map(_.files).getOrElse(Seq.empty).diff(base)
          case (true, None) => Seq.empty
          case _ => latest.map(_.files).getOrElse(Seq.empty)
        }
        prev ++ moved
      }
    } finally {
      if (Files.exists(tmp)) {
        scala.util.Using.resource(Files.walk(tmp)) { st =>
          st.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(Files.deleteIfExists(_))
        }
      }
    }
  }

  /** Rewrite the given base snapshot's files with `data` — surgical
    * (files committed since `baseFiles` survive; stale base aborts).
    * Maintenance.compact's entry point. */
  private[catalog] def replaceFiles(data: DataFrame, baseFiles: Seq[String]): Unit =
    commitWrite(data, overwrite = true, replacedBase = Some(baseFiles))

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
    val baseSnap = Snapshots.latest(tableDir)
    val baseFiles = baseSnap.map(_.files).getOrElse(Seq.empty)
    // FILE-LEVEL PRUNING: only files whose footer stats say the predicate
    // MIGHT match get rewritten; provably-unaffected files stay in place
    // (after compact() sorts on the predicate column, a key-range DELETE
    // over 100 TB rewrites O(1) files). Conservative: stats missing →
    // rewrite.
    val (touched, _) = baseFiles.partition(f =>
      ParquetStats.mayMatchAll(tableDir.resolve(f).toString, filters.toSeq,
        spark.sparkContext.hadoopConfiguration))
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
