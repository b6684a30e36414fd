package graft.catalog

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Catalog-managed Parquet tables behind a Spark DSv2 `TableCatalog with
  * SupportsNamespaces` — the rebuild's stand-in for the reference's
  * Iceberg SQL catalog (`iceberg-sql-catalog`, Cargo.lock:2204, wired at
  * iceberg-datafusion-arrow-flight-sql/src/main.rs:73): multi-level
  * namespaces, schema'd tables, append-only writes, all addressable as
  * `graft.ns.table` from SQL (SURVEY §1.1, §7-M2).
  *
  * Layout under the warehouse root:
  * {{{
  *   <warehouse>/<ns>/<table>/_graft_schema.json   table schema (Spark DDL json)
  *   <warehouse>/<ns>/<table>/data/part-N.parquet       data files (append-only)
  * }}}
  *
  * Reads and writes delegate to Spark's native DSv2 `ParquetTable`, so
  * scans get the full Parquet stack (column pruning, predicate pushdown,
  * row-group pruning, vectorized reader) and `INSERT INTO` appends new
  * files without touching existing ones — the Iceberg-shaped semantics the
  * reference relies on, minus manifests (this class is the swap-in point
  * for the real Iceberg Spark connector when its jar is available —
  * SURVEY §7 "known hard spots").
  */
class MetaCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: Path = _
  private def spark: SparkSession = SparkSession.active

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(options.getOrDefault("warehouse",
      sys.props("java.io.tmpdir") + s"/graft_warehouse_$name"))
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  // --- namespaces -------------------------------------------------------

  private def nsPath(ns: Array[String]): Path =
    ns.foldLeft(warehouse)((p, n) => p.resolve(n))

  override def listNamespaces(): Array[Array[String]] =
    Files.list(warehouse).iterator().asScala
      .filter(Files.isDirectory(_))
      .map(p => Array(p.getFileName.toString)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Files.list(p).iterator().asScala
      .filter(d => Files.isDirectory(d) && !Files.exists(d.resolve("_graft_schema.json")))
      .map(d => namespace :+ d.getFileName.toString).toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    Files.isDirectory(nsPath(namespace))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Map("location" -> nsPath(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit =
    Files.createDirectories(nsPath(namespace))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = ()

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p)) return false
    if (!cascade && Files.list(p).iterator().asScala.nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace.mkString(".")} not empty")
    deleteRecursively(p)
    true
  }

  // --- tables -----------------------------------------------------------

  private def tablePath(ident: Identifier): Path =
    nsPath(ident.namespace()).resolve(ident.name())

  private def schemaFile(ident: Identifier): Path =
    tablePath(ident).resolve("_graft_schema.json")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val p = nsPath(namespace)
    if (!Files.isDirectory(p))
      throw new NoSuchNamespaceException(catalogName +: namespace)
    Files.list(p).iterator().asScala
      .filter(d => Files.exists(d.resolve("_graft_schema.json")))
      .map(d => Identifier.of(namespace, d.getFileName.toString)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    Files.exists(schemaFile(ident))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident))
      throw new NoSuchTableException((ident.namespace() :+ ident.name()).toSeq)
    val schema = DataType.fromJson(Files.readString(schemaFile(ident)))
      .asInstanceOf[StructType]
    val dataDir = tablePath(ident).resolve("data")
    ParquetTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      spark,
      new CaseInsensitiveStringMap(Map("path" -> dataDir.toString).asJava),
      Seq(dataDir.toString),
      Some(schema),
      classOf[ParquetFileFormat])
  }

  override def createTable(ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new TableAlreadyExistsException((ident.namespace() :+ ident.name()).toSeq)
    val schema = new StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    Files.createDirectories(tablePath(ident).resolve("data"))
    Files.writeString(schemaFile(ident), schema.json)
    loadTable(ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "ALTER TABLE is not supported by the graft MetaCatalog (v1)")

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    deleteRecursively(tablePath(ident))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent))
      throw new NoSuchTableException((oldIdent.namespace() :+ oldIdent.name()).toSeq)
    // RENAME TO arrives with the target spelled as the user typed it —
    // possibly catalog-qualified or bare; normalize to this catalog's
    // namespace layout.
    val targetNs = newIdent.namespace() match {
      case ns if ns.isEmpty => oldIdent.namespace()
      case ns if ns.head == catalogName => ns.drop(1)
      case ns => ns
    }
    Files.move(tablePath(oldIdent),
      tablePath(Identifier.of(targetNs, newIdent.name())))
  }

  private def deleteRecursively(p: Path): Unit = {
    Files.walk(p).sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(Files.delete)
  }
}
