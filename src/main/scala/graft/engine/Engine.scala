package graft.engine

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.DFCompat

/** Session → prepare → bind → execute → fetch statement lifecycle, the
  * semantic core of the reference's Flight SQL service
  * (iceberg-datafusion-arrow-flight/src/lib.rs:198-730) re-expressed on
  * Spark, minus the gRPC/Arrow-IPC transport (SURVEY §2.13):
  *
  *  - handshake: basic-auth against FLIGHT_USER/FLIGHT_PASSWORD env
  *    (lib.rs:223-240), mint a UUID bearer token, one isolated session per
  *    token (lib.rs:80, lib.rs:244) → `SparkSession.newSession()` (shared
  *    SparkContext, isolated SQL conf + temp views).
  *  - prepare: SQL → analyzed plan + result schema under a UUID handle
  *    (lib.rs:667-716); the literal query "rollback" returns a one-row
  *    VALUES plan instead of parsing (lib.rs:677, lib.rs:683-696).
  *  - bind: positional string parameters (the reference binds Utf8 scalars
  *    only, lib.rs:613-633) → Spark parameterized SQL.
  *  - execute: materialize and cache the full result before fetch,
  *    exactly like the reference's collect-then-cache (lib.rs:333-344).
  *  - executeUpdate: DDL/DML/SET acknowledged with rowcount -1
  *    (lib.rs:645-654).
  */
final class Engine(root: SparkSession) {

  final case class Statement(
      session: SparkSession,
      sql: String,
      var params: Seq[String] = Nil,
      var result: Option[(StructType, Array[Row])] = None)

  private val sessions = new ConcurrentHashMap[String, SparkSession]()
  private val statements = new ConcurrentHashMap[String, Statement]()

  /** Basic auth (env-driven like lib.rs:223-226); returns bearer token. */
  def handshake(user: String, password: String): Either[String, String] = {
    val expUser = sys.env.getOrElse("FLIGHT_USER", "admin")
    val expPass = sys.env.getOrElse("FLIGHT_PASSWORD", "password")
    if (user == expUser && password == expPass) {
      val token = UUID.randomUUID().toString
      val s = root.newSession()
      DFCompat.install(s)
      sessions.put(token, s)
      Right(token)
    } else Left("Invalid credentials!")  // lib.rs:237-240 wording
  }

  def session(token: String): SparkSession = {
    val s = sessions.get(token)
    if (s == null) throw new IllegalArgumentException(s"no session for token")
    s
  }

  private def plan(st: Statement): DataFrame = {
    if (st.sql.trim.equalsIgnoreCase("rollback"))
      return st.session.sql("SELECT 'ROLLBACK' AS `rollback`")  // lib.rs:683-696
    val sql =
      if (InfoSchema.mentionsInfoSchema(st.sql)) {
        InfoSchema.refresh(st.session)
        InfoSchema.rewrite(st.sql)
      } else st.sql
    if (st.params.nonEmpty) st.session.sql(sql, st.params.toArray[Any])
    else st.session.sql(sql)
  }

  /** SQL → handle + result schema (plan analyzed eagerly, not executed).
    * For parameterized SQL the schema isn't known until bind (Spark has no
    * typed placeholders, unlike DataFusion's $1) — empty schema then. */
  def prepare(token: String, sql: String): (String, StructType) = {
    val st = Statement(session(token), sql)
    val handle = UUID.randomUUID().toString
    val schema = scala.util.Try(plan(st).schema).getOrElse(StructType(Nil))
    statements.put(handle, st)
    (handle, schema)
  }

  /** Bind positional string parameters (Utf8-only, like lib.rs:613-622). */
  def bind(handle: String, params: Seq[String]): Unit =
    statement(handle).params = params

  /** Execute and cache the full result (collect-then-cache semantics of
    * lib.rs:333-344 — by design, NOT a streaming fetch; the distributed
    * heavy lifting still happens on executors, only the final result
    * lands in driver memory, same as the reference's server memory). */
  def execute(handle: String): Long = {
    val st = statement(handle)
    val df = plan(st)
    val rows = df.collect()
    st.result = Some((df.schema, rows))
    rows.length.toLong
  }

  def fetch(handle: String): (StructType, Array[Row]) =
    statement(handle).result.getOrElse(
      throw new IllegalStateException("statement not executed"))

  /** One-shot convenience: prepare + execute + fetch. */
  def executeQuery(token: String, sql: String): (StructType, Array[Row]) = {
    val (h, _) = prepare(token, sql)
    execute(h)
    val r = fetch(h)
    closeStatement(h)
    r
  }

  /** DDL/DML/SET path: runs the statement, returns -1 (lib.rs:653). */
  def executeUpdate(token: String, sql: String): Long = {
    session(token).sql(sql).collect()
    -1L
  }

  def closeStatement(handle: String): Unit = statements.remove(handle)

  def closeSession(token: String): Unit = sessions.remove(token)

  private def statement(handle: String): Statement = {
    val st = statements.get(handle)
    if (st == null) throw new IllegalArgumentException("unknown statement handle")
    st
  }
}
