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
      token: String,
      sql: String,
      var params: Seq[String] = Nil,
      // (schema, row count) once executed. The Row payload lives in
      // `rows` only until the first Arrow encode: after that the cached
      // IPC bytes are the single resident copy (the reference keeps
      // only its encoded batches, lib.rs:333-344) — a row-shaped fetch
      // on an already-encoded statement decodes from the bytes.
      //
      // The (result, rows, ipc) triple is guarded by `this.synchronized`
      // in execute/fetch/fetchArrowFramed: the encode-and-release
      // transition (publish ipc, drop rows) is two writes, and the
      // engine models a multi-client Flight do_get — two concurrent
      // fetches racing that transition could both miss the ipc cache
      // and the loser crash on rows=None (ADVICE r10).
      var result: Option[(StructType, Long)] = None,
      var rows: Option[Array[Row]] = None,
      // Arrow IPC encoding, cached at first fetch:
      // (stream bytes, message-boundary offsets for per-batch framing).
      var ipc: Option[(Array[Byte], Array[Int])] = None,
      var touchedMs: Long = System.currentTimeMillis()) {
    // Per-execute job-group suffix: cancelQuery is STICKY (future jobs
    // of the cancelled group fail too, closing the AQE inter-job gap
    // race), so each execute runs under a fresh attempt id to stay
    // re-executable after a cancel.
    val executeAttempt = new java.util.concurrent.atomic.AtomicInteger(0)
    // The attempts whose workers are CURRENTLY running: the cancel
    // targets. cancelQuery used to read executeAttempt, which a
    // concurrent re-execute increments before its worker starts — a
    // cancel aimed at running attempt N could sticky-cancel the
    // just-started N+1 instead and leave N running (ADVICE r11). A SET,
    // not a scalar: two overlapping executes of one handle are
    // supported, and a single slot would lose attempt N when N+1
    // finishes first and clears it (round-12 self-review). Workers add
    // themselves before their first job and remove on finish.
    val runningAttempts =
      java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
  }

  private val sessions = new ConcurrentHashMap[String, SparkSession]()
  private val statements = new ConcurrentHashMap[String, Statement]()
  // last activity per session token — statement touches count, so a
  // session is "idle" only when NOTHING of it has been used (gcSessions)
  private val sessionTouched = new ConcurrentHashMap[String, Long]()

  /** Cached results live in driver memory (collect-then-cache, like the
    * reference's server-side cache at lib.rs:333-344) — a long-lived
    * service must bound them. Prepare evicts the oldest-idle statement
    * beyond this cap; [[gc]] sweeps idle/orphaned ones. */
  private val maxStatements: Int =
    math.max(1, sys.env.getOrElse("GRAFT_MAX_STATEMENTS", "1024").toInt)

  /** Result-size guards on execute. The reference materializes results
    * unbounded (lib.rs:333-344) and so does the default here — but at
    * 100× data a runaway `SELECT *` OOMs the DRIVER with only the
    * statement-count cap standing between, so a deployment should set
    * GRAFT_MAX_RESULT_ROWS (enforced BEFORE materialization: the collect
    * runs under a limit probe of cap+1 rows, so an over-limit result
    * never becomes resident) and/or GRAFT_MAX_RESULT_BYTES (estimated on
    * the collected rows before they enter the statement cache). Read per
    * execute — system properties override env as the test hook. */
  private def sizeGuard(prop: String, env: String): Option[Long] =
    sys.props.get(prop).orElse(sys.env.get(env)).map(_.trim.toLong)
      .filter(_ > 0)
  private def maxResultRows: Option[Long] =
    sizeGuard("graft.max.result.rows", "GRAFT_MAX_RESULT_ROWS")
  private def maxResultBytes: Option[Long] =
    sizeGuard("graft.max.result.bytes", "GRAFT_MAX_RESULT_BYTES")

  /** Basic auth (env-driven like lib.rs:223-226); returns bearer token. */
  def handshake(user: String, password: String): Either[String, String] = {
    val expUser = sys.env.getOrElse("FLIGHT_USER", "admin")
    val expPass = sys.env.getOrElse("FLIGHT_PASSWORD", "password")
    if (user == expUser && password == expPass) {
      val token = UUID.randomUUID().toString
      val s = root.newSession()
      DFCompat.install(s)
      // env-driven object store, exactly like the reference's server
      // bootstrap (main.rs:46-71): S3 when the credential triple is
      // present, local-FS fallback otherwise.
      ObjectStoreConf.applyEnv(s)
      sessions.put(token, s)
      sessionTouched.put(token, System.currentTimeMillis())
      Right(token)
    } else Left("Invalid credentials!")  // lib.rs:237-240 wording
  }

  def session(token: String): SparkSession = {
    val s = sessions.get(token)
    if (s == null) throw new IllegalArgumentException(s"no session for token")
    sessionTouched.computeIfPresent(token,
      (_, _) => System.currentTimeMillis())
    s
  }

  private val ExplainAnalyze = "(?is)^\\s*EXPLAIN\\s+ANALYZE\\s+(.*)$".r

  private def plan(st: Statement): DataFrame = {
    if (st.sql.trim.equalsIgnoreCase("rollback"))
      return st.session.sql("SELECT 'ROLLBACK' AS `rollback`")  // lib.rs:683-696
    st.sql match {
      // DataFusion's EXPLAIN ANALYZE (served through ctx.sql in the
      // reference): execute fully, report the plan tree with runtime
      // metric values, one row per node.
      case ExplainAnalyze(body) =>
        val lines = org.apache.spark.sql.graftaccess.Internals
          .explainAnalyze(plan(st.copy(sql = body)))
        val s = st.session
        import s.implicits._
        return lines.toDF("plan_with_metrics")
      case _ => ()
    }
    val sql = Engine.rewriteSimilarTo(
      if (InfoSchema.mentionsInfoSchema(st.sql)) {
        InfoSchema.refresh(st.session)
        InfoSchema.rewrite(st.sql)
      } else st.sql)
    if (st.params.nonEmpty) st.session.sql(sql, st.params.toArray[Any])
    else st.session.sql(sql)
  }

  /** Serializes prepare's evict+put tail: check-then-act over the
    * ConcurrentHashMap would let two concurrent prepares race past the
    * size check, and eviction could drop a handle a peer just created
    * (surfacing as a spurious "unknown statement handle"). */
  private val prepareLock = new Object

  /** `?` placeholders outside single-quoted literals (doubled AND
    * backslash-escaped quotes handled) and outside line or block
    * comments. */
  private def countPlaceholders(sql: String): Int = {
    var n = 0; var i = 0
    val len = sql.length
    while (i < len) {
      sql.charAt(i) match {
        case '\'' => // string literal: skip to its end
          i += 1
          var closed = false
          while (i < len && !closed) {
            sql.charAt(i) match {
              case '\\' => i += 2 // Spark-dialect escaped char
              case '\'' => closed = true; i += 1
              case _ => i += 1
            }
          }
        case '-' if i + 1 < len && sql.charAt(i + 1) == '-' => // line comment
          while (i < len && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < len && sql.charAt(i + 1) == '*' => // block comment
          i += 2
          while (i + 1 < len &&
            !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
          i += 2
        case '?' => n += 1; i += 1
        case _ => i += 1
      }
    }
    n
  }

  /** Statements safe to PLAN with dummy bindings at prepare: queries
    * only. Spark executes commands (INSERT/CREATE/SET/...) eagerly at
    * `sql()`, so dummy-binding a parameterized DML would WRITE dummy
    * rows at prepare time. */
  private def isQueryText(sql: String): Boolean = {
    val head = sql.trim.takeWhile(!_.isWhitespace).toUpperCase
    head == "SELECT" || head == "WITH" || head == "VALUES" || head == "TABLE"
  }

  /** SQL → handle + result schema (plan analyzed eagerly, not executed).
    * Parameterized QUERY text still reports its result schema, like the
    * reference (lib.rs:702-708, where $n placeholders are typed Utf8 at
    * prepare): the text is planned once with Utf8 dummy bindings, which
    * matches the engine's Utf8-only bind surface. Parameterized DML is
    * NOT dummy-planned (commands execute eagerly) — empty schema, like
    * before. EXPLAIN ANALYZE short-circuits to its constant schema
    * instead of executing the analyzed query at prepare time. */
  def prepare(token: String, sql: String): (String, StructType) = {
    val st = Statement(session(token), token, sql)
    val handle = UUID.randomUUID().toString
    val schema =
      if (ExplainAnalyze.matches(sql))
        StructType(Seq(org.apache.spark.sql.types.StructField(
          "plan_with_metrics", org.apache.spark.sql.types.StringType)))
      else scala.util.Try(plan(st).schema).orElse(scala.util.Try {
        val n = countPlaceholders(sql)
        require(n > 0 && isQueryText(sql)) // else keep the empty schema
        plan(Statement(st.session, token, sql, Seq.fill(n)(""))).schema
      }).getOrElse(StructType(Nil))
    prepareLock.synchronized {
      while (statements.size() >= maxStatements) evictOldest()
      statements.put(handle, st)
    }
    (handle, schema)
  }

  private def evictOldest(): Unit = {
    import scala.jdk.CollectionConverters._
    statements.entrySet().asScala.minByOption(_.getValue.touchedMs)
      .foreach(e => removeReleasing(Seq(e.getKey)))
  }

  /** Remove statement handles AND release the operator cache of each
    * affected session — the same reclamation [[closeStatement]] performs.
    * Sweeping a handle without the release would leak the LSH/dedup
    * persisted blocks the statement's plan pinned: for a dead client the
    * matching closeStatement never arrives, so the executor storage
    * would stay pinned until closeSession — which never arrives either
    * (a socket disconnect closes nothing). Release is recompute-safe, so
    * a LIVE statement of the same session at worst recomputes. */
  private def removeReleasing(handles: Seq[String]): Unit = {
    val swept = handles.flatMap(h => Option(statements.remove(h)))
    swept.map(_.session).distinct
      .foreach(graft.operators.OperatorCache.release)
  }

  /** Drop statements idle longer than `ttlMillis` and statements whose
    * session has been closed, releasing their sessions' operator cache
    * blocks (see [[removeReleasing]]). Returns how many were collected. */
  def gc(ttlMillis: Long): Int = {
    import scala.jdk.CollectionConverters._
    val cutoff = System.currentTimeMillis() - ttlMillis
    val live = sessions.values().asScala.toSet
    val dead = statements.entrySet().asScala.filter { e =>
      e.getValue.touchedMs < cutoff || !live.contains(e.getValue.session)
    }.map(_.getKey).toSeq
    removeReleasing(dead)
    dead.length
  }

  /** Reclaim sessions with NO activity (handshake/verb/statement touch)
    * for `ttlMillis` — the session-level half of dead-client reclamation:
    * a client that vanishes never sends close_session, and nothing else
    * removes a token from `sessions`, so without this sweep an abandoned
    * session (and any statements it re-prepares) lives forever. Each
    * reclaimed session goes through [[closeSession]] — statements
    * dropped, operator cache released. Returns how many were closed. */
  def gcSessions(ttlMillis: Long): Int = {
    import scala.jdk.CollectionConverters._
    val cutoff = System.currentTimeMillis() - ttlMillis
    val idle = sessionTouched.entrySet().asScala
      .filter(_.getValue < cutoff).map(_.getKey).toSeq
    idle.foreach(closeSession)
    idle.length
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
    // every Spark job this statement submits carries its handle as the
    // job group, so cancelQuery from ANOTHER connection can abort it —
    // the verb the reference leaves Status::unimplemented
    // (do_action_cancel_query, lib.rs:781-787). The group is set
    // BEFORE plan(): session.sql() runs commands (INSERT/CTAS/DELETE)
    // and EXPLAIN ANALYZE eagerly, and those long writes are exactly
    // what a client most wants to cancel. The attempt value must be
    // the LOCAL incrementAndGet result — re-reading the counter would
    // let two concurrent executes of one handle share a suffix.
    //
    // The group property is set on a DEDICATED pool thread, not the
    // caller: Spark job-group properties are InheritableThreadLocal, so
    // any thread born while the caller held the group (e.g. a fork-join
    // compensation thread spawned by the blocking collect) would
    // inherit it — and after a STICKY cancel such a zombie property
    // poisons every unrelated job that thread later submits. Pool
    // threads set the group per task and CLEAR it in finally, so no
    // value outlives its execute; the pool bounds worker threads under
    // load where thread-per-execute was unbounded (ADVICE r11).
    val attempt = st.executeAttempt.incrementAndGet()
    val outcome = new java.util.concurrent.atomic.AtomicReference[
      Either[Throwable, (org.apache.spark.sql.DataFrame, Array[Row])]]()
    val task: Runnable = () => {
      val sc = st.session.sparkContext
      sc.setJobGroup(Engine.jobGroup(handle) + "-" + attempt,
        s"graft statement $handle", interruptOnCancel = true)
      st.runningAttempts.add(attempt)
      try { // outside the lock: old-result fetches stay servable
        val d = plan(st)
        val rows = maxResultRows match {
          case Some(cap) =>
            // limit-probe: collect at most cap+1 rows — an over-limit
            // result FAILS without ever being driver-resident (the
            // CollectLimit stops executors early); an under-limit
            // result is byte-identical to the unguarded collect
            val lim = math.min(cap, Int.MaxValue.toLong - 1).toInt
            val r = d.limit(lim + 1).collect()
            if (r.length > lim) throw new IllegalStateException(
              s"result exceeds GRAFT_MAX_RESULT_ROWS=$cap for statement " +
                s"$handle; narrow the query or raise the cap")
            r
          case None => d.collect()
        }
        maxResultBytes.foreach { cap =>
          val est = org.apache.spark.util.SizeEstimator.estimate(rows)
          if (est > cap) throw new IllegalStateException(
            s"result estimated at $est bytes exceeds " +
              s"GRAFT_MAX_RESULT_BYTES=$cap for statement $handle; " +
              "narrow the query or raise the cap")
        }
        outcome.set(Right((d, rows)))
      } catch { case e: Throwable => outcome.set(Left(e)) }
      finally {
        st.runningAttempts.remove(attempt)
        sc.clearJobGroup()
      }
    }
    val fut = Engine.execPool.submit(task)
    try fut.get()
    catch {
      case ie: InterruptedException =>
        // The CALLER was interrupted (client gone, server shutting
        // down): without this, the worker's Spark jobs would run to
        // completion unobserved, their result discarded (ADVICE r11).
        // Sticky-cancel the attempt's group — the worker unwinds with a
        // cancellation SparkException and releases its pool slot.
        st.session.sparkContext.cancelJobGroupAndFutureJobs(
          Engine.jobGroup(handle) + "-" + attempt)
        throw ie
    }
    val (df, rows) = outcome.get() match {
      case Left(e) => throw e
      case Right(r) => r
    }
    st.synchronized {
      st.result = Some((df.schema, rows.length.toLong))
      st.rows = Some(rows)
      st.ipc = None // new result: any cached encoding is stale
    }
    rows.length.toLong
  }

  /** Cancel a RUNNING statement's Spark jobs (`cancel_query` verb —
    * Flight SQL's ActionCancelQueryRequest; the reference stubs it,
    * lib.rs:781-787). STICKY (`cancelJobGroupAndFutureJobs`): an AQE
    * collect runs several sequential jobs with gaps between them, so a
    * non-sticky cancel landing in a gap would kill nothing and the
    * remaining jobs would run to completion. The blocked `execute`
    * fails with a cancellation SparkException; the statement handle
    * itself stays valid — the old cached result (if any) remains
    * fetchable, and a NEW execute clears the sticky flag by running
    * under a fresh attempt-suffixed group. */
  def cancelQuery(handle: String): Unit = {
    val st = statement(handle)
    // Target every RUNNING attempt, not the latest allocated one: a
    // concurrent re-execute bumps executeAttempt before its worker
    // starts, and a cancel aimed at running attempt N must not land on
    // the fresh N+1 instead (ADVICE r11); with overlapping executes of
    // one handle, BOTH in-flight attempts are this statement's query
    // and both are cancelled. executeAttempt.get() is ALWAYS unioned in
    // (not only when the running set is empty — ADVICE r12): with one
    // attempt running and a second freshly allocated but not yet in
    // runningAttempts (the window between incrementAndGet and the pool
    // worker's add, which includes any pool-queue wait), both are this
    // statement's query; a sticky cancel on a not-yet-started group is
    // harmless and attempt ids are never reused.
    import scala.jdk.CollectionConverters._
    val targets =
      (st.runningAttempts.asScala.toSeq :+ st.executeAttempt.get())
        .distinct.sorted
    targets.foreach { a =>
      st.session.sparkContext.cancelJobGroupAndFutureJobs(
        Engine.jobGroup(handle) + "-" + a)
    }
  }

  def fetch(handle: String): (StructType, Array[Row]) = {
    val st = statement(handle)
    st.synchronized {
      val (schema, _) = st.result.getOrElse(
        throw new IllegalStateException("statement not executed"))
      val rows = st.rows.getOrElse {
        // Rows were released at the first Arrow encode — rebuild them
        // from the cached bytes. A transient decode on the (rare) row-
        // fetch-after-arrow-fetch path, instead of BOTH copies resident
        // for the statement's whole lifetime (VERDICT r9 #6).
        org.apache.spark.sql.graftaccess.Internals
          .arrowIpcToRows(schema, st.ipc.get._1)
      }
      (schema, rows)
    }
  }

  /** Result as ONE Arrow IPC stream — the reference's actual wire format
    * (`do_get_fallback` serves cached batches, lib.rs:288-295). Encodes
    * the result [[execute]] cached — NO second execution, no Spark job:
    * a fetch always returns exactly the rows execute() counted, even if
    * the underlying table mutated in between (repeatable read within one
    * statement lifecycle, like the reference's server-side cache).
    * The encoding itself is ALSO cached: the first fetch pays the
    * Row→Arrow serialize once (like the reference's encode-once batch
    * cache, lib.rs:333-344); every later fetch returns the same bytes
    * (reference-equal) until a re-execute invalidates them. */
  def fetchArrow(handle: String): Array[Byte] = fetchArrowFramed(handle)._1

  /** [[fetchArrow]] plus the IPC message-boundary offsets: slicing the
    * stream at the offsets gives schema-message / record-batch frames a
    * Flight `DoGet` would carry one FlightData each — the transport can
    * frame per-batch with zero copies. */
  def fetchArrowFramed(handle: String): (Array[Byte], Array[Int]) = {
    val st = statement(handle)
    // The whole read-or-encode is one critical section: the encode-and-
    // release transition (ipc := Some, rows := None) must be atomic with
    // respect to concurrent fetches, or a second fetch could miss the
    // ipc cache and then find rows already gone (ADVICE r10). Encoding
    // under the lock serializes concurrent first-fetches — which is also
    // what makes the encode happen ONCE.
    st.synchronized {
      st.ipc.getOrElse {
        val (schema, _) = st.result.getOrElse(
          throw new IllegalStateException("statement not executed"))
        val enc = org.apache.spark.sql.graftaccess.Internals
          .rowsToArrowIpcFramed(st.session, schema, st.rows.get)
        st.ipc = Some(enc)
        // Single residency from here on: fetches are served from the
        // cached bytes (row-shaped ones decode), re-execute rebuilds.
        st.rows = None
        enc
      }
    }
  }

  /** One-shot convenience: prepare + execute + fetch. */
  def executeQuery(token: String, sql: String): (StructType, Array[Row]) = {
    val (h, _) = prepare(token, sql)
    execute(h)
    val r = fetch(h)
    closeStatement(h)
    r
  }

  /** SQL string literal with doubled quotes (introspection filters). */
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Flight SQL's catalog metadata surface (CommandGetCatalogs shape).
    * The reference leaves the catalog metadata RPCs unimplemented
    * (lib.rs:382-482) and clients introspect through information_schema
    * SQL instead (lib.rs:92); these verbs serve exactly that listing —
    * same snapshot, Flight SQL's column names — so a fresh client can
    * discover catalogs/schemas/tables without knowing the dialect. */
  def getCatalogs(token: String): (StructType, Array[Row]) =
    executeQuery(token,
      "SELECT DISTINCT table_catalog AS catalog_name " +
        "FROM information_schema.tables ORDER BY catalog_name")

  /** CommandGetDbSchemas shape: `catalog` filters exactly,
    * `schemaPattern` is a SQL LIKE pattern (`%`/`_`), both optional —
    * Flight SQL's filter semantics. */
  def getDbSchemas(token: String, catalog: Option[String] = None,
      schemaPattern: Option[String] = None): (StructType, Array[Row]) = {
    val conds = catalog.map(c => s"table_catalog = ${sqlLit(c)}").toSeq ++
      schemaPattern.map(p => s"table_schema LIKE ${sqlLit(p)}")
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    executeQuery(token,
      "SELECT DISTINCT table_catalog AS catalog_name, " +
        "table_schema AS db_schema_name " +
        s"FROM information_schema.tables$where " +
        "ORDER BY catalog_name, db_schema_name")
  }

  /** CommandGetTables shape: exact `catalog`, LIKE patterns for schema
    * and table name, and an optional `tableTypes` allowlist matched
    * against the engine's table_type values (MANAGED/EXTERNAL/VIEW/
    * TEMPORARY, as information_schema.tables reports them). */
  def getTables(token: String, catalog: Option[String] = None,
      schemaPattern: Option[String] = None,
      tablePattern: Option[String] = None,
      tableTypes: Seq[String] = Nil): (StructType, Array[Row]) = {
    val conds = catalog.map(c => s"table_catalog = ${sqlLit(c)}").toSeq ++
      schemaPattern.map(p => s"table_schema LIKE ${sqlLit(p)}") ++
      tablePattern.map(p => s"table_name LIKE ${sqlLit(p)}") ++
      (if (tableTypes.isEmpty) None
       else Some(tableTypes.map(sqlLit).mkString("table_type IN (", ", ", ")")))
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    executeQuery(token,
      "SELECT table_catalog AS catalog_name, " +
        "table_schema AS db_schema_name, table_name, table_type " +
        s"FROM information_schema.tables$where " +
        "ORDER BY catalog_name, db_schema_name, table_name")
  }

  /** GetColumns shape (JDBC/ADBC's column listing; Flight SQL serves it
    * as CommandGetTables with include_schema=true — same filter
    * semantics): exact `catalog`, LIKE patterns for schema / table /
    * column name, over the engine's information_schema.columns snapshot.
    * Ordinal position and nullability come from the live table schema
    * (InfoSchema reads the loaded table, not DESCRIBE strings). */
  def getColumns(token: String, catalog: Option[String] = None,
      schemaPattern: Option[String] = None,
      tablePattern: Option[String] = None,
      columnPattern: Option[String] = None): (StructType, Array[Row]) = {
    val conds = catalog.map(c => s"table_catalog = ${sqlLit(c)}").toSeq ++
      schemaPattern.map(p => s"table_schema LIKE ${sqlLit(p)}") ++
      tablePattern.map(p => s"table_name LIKE ${sqlLit(p)}") ++
      columnPattern.map(p => s"column_name LIKE ${sqlLit(p)}")
    val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
    executeQuery(token,
      "SELECT table_catalog AS catalog_name, " +
        "table_schema AS db_schema_name, table_name, column_name, " +
        "ordinal_position, data_type, is_nullable " +
        s"FROM information_schema.columns$where " +
        "ORDER BY catalog_name, db_schema_name, table_name, ordinal_position")
  }

  /** DDL/DML/SET path: runs the statement, returns -1 (lib.rs:653).
    * Result rows are NEVER materialized on the driver: commands execute
    * eagerly at `sql()`, query-shaped text drains on the executors. */
  def executeUpdate(token: String, sql: String): Long = {
    org.apache.spark.sql.graftaccess.Internals.runWithoutCollect(
      session(token).sql(Engine.rewriteSimilarTo(sql)))
    -1L
  }

  /** Closing a statement also releases the operator cache blocks its
    * session accumulated ([[graft.operators.OperatorCache]]): operators
    * like Dedup/LmScore persist heavy intermediates behind lazy
    * DataFrames, and the statement close is the engine-side point where
    * "the caller's last action ran" is known — executor storage returns
    * to baseline here (VERDICT r7 #4). Unpersist is recompute-safe, so a
    * concurrent statement of the same session at worst recomputes. */
  def closeStatement(handle: String): Unit = {
    val st = statements.remove(handle)
    if (st != null) graft.operators.OperatorCache.release(st.session)
  }

  /** Closing a session also drops its statements — their cached results
    * are unreachable once the token is gone — and releases its tracked
    * operator cache blocks. */
  def closeSession(token: String): Unit = {
    import scala.jdk.CollectionConverters._
    sessionTouched.remove(token)
    val s = sessions.remove(token)
    if (s != null) {
      statements.entrySet().asScala.filter(_.getValue.session eq s)
        .map(_.getKey).toSeq.foreach(statements.remove)
      graft.operators.OperatorCache.release(s)
      // drop the session's cached CC child session too (r19): weak keys
      // alone cannot promise collection while Spark internals reference
      // the closed parent, so the engine evicts deterministically here
      graft.operators.Dedup.releaseLoopSession(s)
    }
  }

  /** Test hook: whether the statement still holds its Row array — it
    * must NOT after the first Arrow encode (single-residency contract,
    * VERDICT r9 #6). */
  private[graft] def rowsResident(handle: String): Boolean =
    statement(handle).rows.isDefined

  private def statement(handle: String): Statement = {
    val st = statements.get(handle)
    if (st == null) throw new IllegalArgumentException("unknown statement handle")
    st.touchedMs = System.currentTimeMillis()
    // statement activity keeps its session alive (gcSessions reclaims
    // only sessions where NOTHING has been touched)
    sessionTouched.computeIfPresent(st.token, (_, _) => st.touchedMs)
    st
  }
}

object Engine {

  /** Spark job-group name tagging every job a statement submits —
    * the cancellation key for [[Engine.cancelQuery]]. */
  private[graft] def jobGroup(handle: String): String = s"graft-stmt-$handle"

  /** Bounded worker pool for [[Engine.execute]] (ADVICE r11: a thread
    * per execute is unbounded under load). Daemon threads, shared by
    * all engines in the JVM — they carry no state between tasks (the
    * job-group property is set per task and cleared in its finally).
    * Sized by GRAFT_EXEC_THREADS (floor 1, default 16 — matches the
    * reference's tokio worker default, a handful of concurrent
    * statements per process). */
  private[engine] lazy val execPool: java.util.concurrent.ExecutorService = {
    val n = math.max(1, sys.env.get("GRAFT_EXEC_THREADS")
      .flatMap(_.toIntOption).getOrElse(16))
    java.util.concurrent.Executors.newFixedThreadPool(n,
      new java.util.concurrent.ThreadFactory {
        private val i = new java.util.concurrent.atomic.AtomicInteger(0)
        def newThread(r: Runnable): Thread = {
          val t = new Thread(r, s"graft-exec-${i.incrementAndGet()}")
          t.setDaemon(true)
          t
        }
      })
  }

  /** `[NOT] SIMILAR TO '<pattern>' [ESCAPE '<c>']` with literal pattern
    * and escape — the shim's supported shape (no computed patterns).
    * Anchored at the scan position via `lookingAt`. */
  private val SimilarToRe = java.util.regex.Pattern.compile(
    "(?is)(NOT\\s+)?SIMILAR\\s+TO\\s+'((?:[^']|'')*)'" +
      "(?:\\s+ESCAPE\\s+'([^']|'')')?")

  private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_'

  /** Rewrite SQL's `SIMILAR TO` (in the reference's grammar via
    * sqlparser — iceberg-datafusion-arrow-flight consumes it through
    * `ctx.sql`, lib.rs:678) into Spark's `RLIKE`. Spark has no SIMILAR
    * TO; the operator is a full-string regex match over a pattern
    * language that is POSIX regex EXCEPT:
    *   - `%` / `_` are the LIKE wildcards (→ `.*` / `.`),
    *   - `.` / `^` / `$` are literal characters (→ escaped),
    *   - alternation/quantifiers/groups/bracket classes keep their
    *     regex meaning, and the match is anchored at both ends,
    *   - `ESCAPE '<c>'` declares the escape character (default
    *     backslash, PostgreSQL-style); escape + any char is that
    *     literal char.
    * Literal-pattern occurrences only; applied in the Engine's
    * prepare/plan path so every service entry point sees it.
    *
    * The scan is quote/comment-aware: string literals (`'…''…'`),
    * quoted identifiers (`"…"`, backticks), `--` line comments and
    * `/* */` block comments are copied verbatim, so `SIMILAR TO` text
    * INSIDE them is never rewritten — only the keyword occurrence in
    * actual SQL position is. */
  def rewriteSimilarTo(sql: String): String = {
    if (sql.toLowerCase(java.util.Locale.ROOT).indexOf("similar") < 0)
      return sql
    val n = sql.length
    // java.lang.StringBuilder: the 3-arg subsequence append (Scala's
    // would auto-tuple a 3-arg call into append(Any))
    val out = new java.lang.StringBuilder(n + 16)
    val m = SimilarToRe.matcher(sql)
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          // literal / quoted identifier: copy verbatim (doubled-quote
          // escapes stay inside the span; in ' and " string literals
          // Spark's default parser also accepts backslash-escaped
          // chars — 'don\'t' — so a backslash skips the next char lest
          // the span end early; backticked identifiers double only)
          var j = i + 1
          var done = false
          while (!done && j < n) {
            val cj = sql.charAt(j)
            if (cj == '\\' && c != '`' && j + 1 < n) j += 2
            else if (cj == c) {
              if (j + 1 < n && sql.charAt(j + 1) == c) j += 2 else done = true
            } else j += 1
          }
          val end = math.min(j + 1, n)
          out.append(sql, i, end); i = end
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          var j = i + 2
          while (j < n && sql.charAt(j) != '\n') j += 1
          out.append(sql, i, j); i = j
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          val close = sql.indexOf("*/", i + 2)
          val end = if (close < 0) n else close + 2
          out.append(sql, i, end); i = end
        case 'n' | 'N' | 's' | 'S'
            if (i == 0 || !isWordChar(sql.charAt(i - 1))) => {
          m.region(i, n)
          if (m.lookingAt()) {
            val not = if (m.group(1) == null) "" else "NOT "
            val esc = m.group(3) match {
              case null => '\\' // PostgreSQL's default SIMILAR TO escape
              case "''" => '\''
              case s => s.charAt(0)
            }
            val rx = similarToRegex(m.group(2), esc)
            out.append(s"${not}RLIKE '$rx'")
            i = m.end()
          } else { out.append(c); i += 1 }
        }
        case other => out.append(other); i += 1
      }
    }
    out.toString
  }

  /** SIMILAR TO pattern → anchored Java regex, escaped for a Spark SQL
    * single-quoted literal (backslashes doubled — Spark's legacy literal
    * parser processes `\x` escapes; doubled `''` pass through as the
    * literal-quote encoding). `esc` is the declared ESCAPE character
    * (default backslash, PostgreSQL-style); with a custom escape a bare
    * backslash is an ordinary literal character. */
  private[engine] def similarToRegex(pattern: String,
      esc: Char = '\\'): String = {
    val RegexSpecial = "\\^$.|?*+()[]{}&-"
    // the raw group still carries SQL's doubled-quote encoding — undo it
    // here (the scan below works on LOGICAL pattern chars) and re-double
    // any quote emitted into the output literal (see emit)
    val p = pattern.replace("''", "'")
    val raw = new StringBuilder
    var i = 0
    var inClass = false
    // true right after `[` or `[^` — a `]` there is the POSIX literal-`]`
    // form (`[]]`), which Java regex needs escaped
    var classOpening = false
    // append one char as-is, re-encoding a quote for the SQL literal
    def emit(ch: Char): Unit =
      if (ch == '\'') raw.append("''") else raw.append(ch)
    // append one LITERAL character into the regex (escaping as needed)
    def literal(ch: Char): Unit = {
      if (RegexSpecial.indexOf(ch.toInt) >= 0) raw.append('\\')
      emit(ch)
    }
    while (i < p.length) {
      val c = p.charAt(i)
      if (inClass) {
        if (c == esc && i + 1 < p.length) {
          // escaped char inside the class is literal (an escaped `]`
          // must NOT close the class)
          literal(p.charAt(i + 1))
          classOpening = false
          i += 2
        } else {
          if (c == ']') {
            if (classOpening) raw.append("\\]")
            else { raw.append(']'); inClass = false }
          } else if (c == '\\') raw.append("\\\\") // literal under custom esc
          else emit(c)
          classOpening = classOpening && c == '^'
          i += 1
        }
      } else {
        if (c == esc && i + 1 < p.length) {
          // SIMILAR TO escape: next char is literal
          literal(p.charAt(i + 1))
          i += 2
        } else c match {
          case '%' => raw.append(".*"); i += 1
          case '_' => raw.append('.'); i += 1
          case '[' =>
            raw.append('['); inClass = true; classOpening = true; i += 1
          case '.' | '^' | '$' => raw.append('\\').append(c); i += 1
          case '\\' => raw.append("\\\\"); i += 1 // literal under custom esc
          case other => emit(other); i += 1
        }
      }
    }
    ("^(?:" + raw.toString + ")$").replace("\\", "\\\\")
  }
}
