package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Read-path REST catalog — the analogue of the reference's SECOND binary,
  * which wires an Iceberg REST catalog client into the same engine
  * (`iceberg-datafusion-arrow-flight-rest/src/main.rs:42-117`: REST
  * `CatalogClient` → `IcebergCatalogProvider` → SessionContext).
  *
  * The endpoint shape follows the public Iceberg REST spec:
  *
  *   GET /v1/config
  *   GET /v1/namespaces                    → {"namespaces": [["db"], ...]}
  *   GET /v1/namespaces/{ns}               → 200 / 404
  *   GET /v1/namespaces/{ns}/tables        → {"identifiers": [{"namespace": [...], "name": t}]}
  *   GET /v1/namespaces/{ns}/tables/{t}    → {"metadata": {"location", "schema-json",
  *                                            "partition-cols", "properties"}}
  *
  * with multi-level namespaces joined by the spec's 0x1F unit separator.
  * Like Iceberg REST, the catalog serves POINTERS: `loadTable` fetches
  * metadata (location + schema) and the engine then scans the data files
  * directly — the catalog server never sits on the data path, which is
  * what lets one tiny REST service front a 100 TB warehouse. Scans reuse
  * [[GraftTable]], so pushdown/pruning behave exactly as for
  * [[MetaCatalog]] tables. Writes are rejected: the reference's REST
  * binary exposes the catalog read path the same way.
  */
class RestCatalog extends TableCatalog with SupportsNamespaces {

  private val mapper = new ObjectMapper()
  private var name0: String = _
  private var uri: String = _
  private val http = HttpClient.newHttpClient()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    name0 = name
    uri = Option(options.get("uri")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.uri is required for the REST catalog"))
      .stripSuffix("/")
  }

  override def name(): String = name0

  private def nsPart(namespace: Array[String]): String =
    java.net.URLEncoder.encode(namespace.mkString("\u001f"), "UTF-8")

  private def get(path: String): Option[JsonNode] = {
    val res = http.send(
      HttpRequest.newBuilder(URI.create(s"$uri$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    if (res.statusCode() == 200) Some(mapper.readTree(res.body()))
    else if (res.statusCode() == 404) None
    else throw new IllegalStateException(
      s"REST catalog $name0: GET $path → HTTP ${res.statusCode()}")
  }

  // --- namespaces -------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    get("/v1/namespaces").map { j =>
      j.get("namespaces").elements().asScala.map { ns =>
        ns.elements().asScala.map(_.asText()).toArray
      }.toArray
    }.getOrElse(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    get(s"/v1/namespaces?parent=${nsPart(namespace)}").map { j =>
      j.get("namespaces").elements().asScala.map { ns =>
        ns.elements().asScala.map(_.asText()).toArray
      }.toArray
    }.getOrElse(throw new NoSuchNamespaceException(name0 +: namespace))

  override def namespaceExists(namespace: Array[String]): Boolean =
    get(s"/v1/namespaces/${nsPart(namespace)}").isDefined

  override def loadNamespaceMetadata(namespace: Array[String])
      : java.util.Map[String, String] =
    get(s"/v1/namespaces/${nsPart(namespace)}") match {
      case Some(_) => java.util.Collections.emptyMap()
      case None => throw new NoSuchNamespaceException(name0 +: namespace)
    }

  // --- tables -----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] =
    get(s"/v1/namespaces/${nsPart(namespace)}/tables").map { j =>
      j.get("identifiers").elements().asScala.map { id =>
        val ns = id.get("namespace").elements().asScala.map(_.asText()).toArray
        Identifier.of(ns, id.get("name").asText())
      }.toArray
    }.getOrElse(throw new NoSuchNamespaceException(name0 +: namespace))

  override def tableExists(ident: Identifier): Boolean =
    get(s"/v1/namespaces/${nsPart(ident.namespace())}/tables/${ident.name()}")
      .isDefined

  override def loadTable(ident: Identifier): Table = {
    val j = get(
      s"/v1/namespaces/${nsPart(ident.namespace())}/tables/${ident.name()}")
      .getOrElse(throw new NoSuchTableException(
        (ident.namespace() :+ ident.name()).toSeq))
    val meta = j.get("metadata")
    val schema = DataType.fromJson(meta.get("schema-json").asText())
      .asInstanceOf[StructType]
    val parts = Option(meta.get("partition-cols")).toSeq
      .flatMap(_.elements().asScala.map(_.asText()))
    val props = Option(meta.get("properties")).map { p =>
      p.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    new RestReadOnlyTable(new GraftTable(
      s"$name0.${ident.namespace().mkString(".")}.${ident.name()}",
      Paths.get(meta.get("location").asText()), schema, parts, props, None))
  }

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    s"REST catalog $name0 is read-only (reference wires the catalog READ " +
      "path, iceberg-datafusion-arrow-flight-rest/src/main.rs:42-117)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = readOnly
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    readOnly
  override def dropTable(ident: Identifier): Boolean = readOnly
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    readOnly
  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = readOnly
  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit = readOnly
  override def dropNamespace(namespace: Array[String], cascade: Boolean)
      : Boolean = readOnly
}

/** Read-only projection of a [[GraftTable]]: exposes the scan surface
  * (pushdown/pruning intact) but no write capabilities, so INSERT/DELETE
  * against the REST catalog fail at analysis instead of silently writing
  * to a warehouse the catalog does not own. */
private[catalog] final class RestReadOnlyTable(underlying: GraftTable)
    extends Table with SupportsRead {
  override def name(): String = underlying.name()
  override def schema(): StructType = underlying.schema()
  override def partitioning()
      : Array[org.apache.spark.sql.connector.expressions.Transform] =
    underlying.partitioning()
  override def properties(): java.util.Map[String, String] =
    underlying.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    underlying.newScanBuilder(options)
}

/** In-process REST catalog server over a MetaCatalog warehouse directory —
  * the test/offline stand-in for an Iceberg REST service. Serves the
  * endpoint surface [[RestCatalog]] consumes; table metadata is the
  * warehouse's own `_graft_schema.json` / `_graft_props.properties`, and
  * the reported `location` lets the engine scan data files directly. */
final class RestCatalogServer(warehouse: Path, requestedPort: Int = 0) {

  private val mapper = new ObjectMapper()
  private var server: com.sun.net.httpserver.HttpServer = _

  def port: Int = server.getAddress.getPort

  private def isTable(p: Path): Boolean =
    Files.exists(p.resolve("_graft_schema.json"))

  private def childDirs(p: Path): Seq[Path] =
    if (!Files.isDirectory(p)) Seq.empty
    else scala.util.Using.resource(Files.list(p)) { st =>
      st.iterator().asScala.filter(Files.isDirectory(_)).toSeq
        .sortBy(_.getFileName.toString)
    }

  private def nsOf(encoded: String): Seq[String] =
    java.net.URLDecoder.decode(encoded, "UTF-8").split('\u001f').toSeq

  private def json(obj: Any): String = mapper.writeValueAsString(obj)

  def start(): Unit = {
    server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", requestedPort), 0)
    server.createContext("/v1", handler _)
    server.setExecutor(null)
    server.start()
  }

  def stop(): Unit = if (server != null) server.stop(0)

  private def handler(ex: com.sun.net.httpserver.HttpExchange): Unit = {
    val (code, body) =
      try route(ex.getRequestURI.getPath, Option(ex.getRequestURI.getQuery))
      catch { case e: Throwable => (500, s"""{"error":"${e.getMessage}"}""") }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def route(path: String, query: Option[String]): (Int, String) = {
    val segs = path.stripPrefix("/v1").stripPrefix("/").split('/').toSeq
      .filter(_.nonEmpty)
    segs match {
      case Seq("config") =>
        (200, """{"defaults":{},"overrides":{}}""")
      case Seq("namespaces") =>
        val parent = query.flatMap(_.split('&').find(_.startsWith("parent=")))
          .map(q => nsOf(q.stripPrefix("parent=")))
        val base = parent.foldLeft(warehouse)((p, ns) =>
          ns.foldLeft(p)(_.resolve(_)))
        if (parent.isDefined && !Files.isDirectory(base)) (404, "{}")
        else {
          // spec semantics = IMMEDIATE children only, both with and
          // without parent= (clients recurse themselves; returning the
          // whole tree here would make a recursive client double-count)
          val out = parent match {
            case Some(ns) => childDirs(base).filterNot(isTable)
              .map(d => ns :+ d.getFileName.toString)
            case None => childDirs(warehouse).filterNot(isTable)
              .map(d => Seq(d.getFileName.toString))
          }
          (200, "{\"namespaces\":" +
            json(out.map(_.toArray).toArray) + "}")
        }
      case Seq("namespaces", ns) =>
        val dir = nsOf(ns).foldLeft(warehouse)(_.resolve(_))
        if (Files.isDirectory(dir) && !isTable(dir))
          (200, s"""{"namespace":${json(nsOf(ns).toArray)},"properties":{}}""")
        else (404, "{}")
      case Seq("namespaces", ns, "tables") =>
        val parts = nsOf(ns)
        val dir = parts.foldLeft(warehouse)(_.resolve(_))
        if (!Files.isDirectory(dir)) (404, "{}")
        else {
          val ids = childDirs(dir).filter(isTable).map { d =>
            s"""{"namespace":${json(parts.toArray)},"name":${json(d.getFileName.toString)}}"""
          }
          (200, s"""{"identifiers":[${ids.mkString(",")}]}""")
        }
      case Seq("namespaces", ns, "tables", t) =>
        val dir = nsOf(ns).foldLeft(warehouse)(_.resolve(_)).resolve(t)
        if (!isTable(dir)) (404, "{}")
        else {
          val schemaJson = Files.readString(dir.resolve("_graft_schema.json"))
          val propsFile = dir.resolve("_graft_props.properties")
          val props = new java.util.Properties()
          if (Files.exists(propsFile)) {
            val in = Files.newInputStream(propsFile)
            try props.load(in) finally in.close()
          }
          val partCols = Option(props.getProperty("graft.partition.columns"))
            .toSeq.flatMap(_.split(",")).filter(_.nonEmpty)
          props.remove("graft.partition.columns")
          val propMap = props.stringPropertyNames().asScala
            .map(k => k -> props.getProperty(k)).toMap
          val meta = Map(
            "location" -> dir.toString,
            "schema-json" -> schemaJson,
            "partition-cols" -> partCols.toArray,
            "properties" -> propMap.asJava)
          (200, s"""{"metadata-location":${json(dir.toString)},""" +
            s""""metadata":${json(meta.asJava)}}""")
        }
      case _ => (404, "{}")
    }
  }
}

/** Second server binary, mirroring the reference's two-binary shape:
  * serve a warehouse directory as a REST catalog on GRAFT_REST_PORT
  * (default 8181, the Iceberg REST convention). */
object RestCatalogServerMain {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: RestCatalogServerMain <warehouseDir>")
    val srv = new RestCatalogServer(Paths.get(args(0)),
      sys.env.getOrElse("GRAFT_REST_PORT", "8181").toInt)
    srv.start()
    System.err.println(s"graft REST catalog serving ${args(0)} on :${srv.port}")
    Thread.currentThread().join()
  }
}
