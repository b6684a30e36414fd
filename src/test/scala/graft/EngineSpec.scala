package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Engine

/** Lifecycle parity with the reference service (SURVEY §2.13, §5.5):
  * auth, per-token session isolation, prepare/bind/execute/fetch/close,
  * the "rollback" special case, DDL rowcount -1, information_schema.
  */
class EngineSpec extends AnyFunSuite {
  private lazy val engine = new Engine(TestSpark.spark)
  private lazy val token = engine.handshake("admin", "password").toOption.get

  test("handshake rejects bad credentials like lib.rs:237-240") {
    assert(engine.handshake("admin", "wrong").isLeft)
    assert(engine.handshake("nobody", "password").isLeft)
  }

  test("prepare returns the result schema without executing") {
    val (h, schema) = engine.prepare(token, "SELECT 1 AS one, 'x' AS s")
    assert(schema.fieldNames.toSeq == Seq("one", "s"))
    engine.closeStatement(h)
  }

  test("prepare → execute → fetch round-trip") {
    val (h, _) = engine.prepare(token,
      "SELECT id, id * 2 AS twice FROM range(5) ORDER BY id")
    assert(engine.execute(h) == 5)
    val (schema, rows) = engine.fetch(h)
    assert(schema.fieldNames.toSeq == Seq("id", "twice"))
    assert(rows.map(_.getLong(1)).toSeq == Seq(0L, 2L, 4L, 6L, 8L))
    engine.closeStatement(h)
  }

  test("string parameter binding (Utf8-only, lib.rs:613-622)") {
    val (h, _) = engine.prepare(token, "SELECT ? AS a, ? AS b")
    engine.bind(h, Seq("hello", "world"))
    engine.execute(h)
    val (_, rows) = engine.fetch(h)
    assert(rows.head.getString(0) == "hello" && rows.head.getString(1) == "world")
    engine.closeStatement(h)
  }

  test("literal 'rollback' short-circuits to a one-row plan (lib.rs:677)") {
    val (_, rows) = engine.executeQuery(token, "  ROLLBACK  ")
    assert(rows.length == 1 && rows.head.getString(0) == "ROLLBACK")
  }

  test("DDL goes through executeUpdate and reports -1 (lib.rs:653)") {
    assert(engine.executeUpdate(token,
      "CREATE OR REPLACE TEMPORARY VIEW ddl_probe AS SELECT 42 AS v") == -1L)
    val (_, rows) = engine.executeQuery(token, "SELECT v FROM ddl_probe")
    assert(rows.head.getInt(0) == 42)
  }

  test("sessions are isolated per token (temp views don't leak)") {
    val token2 = engine.handshake("admin", "password").toOption.get
    engine.executeUpdate(token,
      "CREATE OR REPLACE TEMPORARY VIEW leak_probe AS SELECT 1 AS v")
    val failed = scala.util.Try(
      engine.executeQuery(token2, "SELECT * FROM leak_probe")).isFailure
    assert(failed)
    engine.closeSession(token2)
  }

  test("information_schema.tables is queryable via SQL (lib.rs:92)") {
    engine.executeUpdate(token,
      "CREATE OR REPLACE TEMPORARY VIEW info_probe AS SELECT 1 AS v")
    val (_, rows) = engine.executeQuery(token,
      "SELECT table_name FROM information_schema.tables " +
        "WHERE table_name = 'info_probe'")
    assert(rows.length == 1)
  }

  test("information_schema.columns and df_settings") {
    val (_, cols) = engine.executeQuery(token,
      "SELECT column_name, data_type FROM information_schema.columns " +
        "WHERE table_name = 'info_probe' ORDER BY ordinal_position")
    assert(cols.head.getString(0) == "v" && cols.head.getString(1) == "int")
    val (_, conf) = engine.executeQuery(token,
      "SELECT value FROM information_schema.df_settings " +
        "WHERE name = 'spark.sql.session.timeZone'")
    assert(conf.head.getString(0) == "UTC")
  }

  test("unknown statement handle raises") {
    assert(scala.util.Try(engine.execute("nope")).isFailure)
  }

  test("concurrent sessions execute independently without cross-talk") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (1 to 6).map { i =>
      Future {
        val t = engine.handshake("admin", "password").toOption.get
        engine.executeUpdate(t,
          s"CREATE OR REPLACE TEMPORARY VIEW conc_$i AS SELECT $i AS v")
        val (_, rows) = engine.executeQuery(t,
          s"SELECT v * 10 FROM conc_$i")
        engine.closeSession(t)
        rows.head.getInt(0)
      }
    }
    assert(Await.result(Future.sequence(futures), 120.seconds) ==
      (1 to 6).map(_ * 10))
  }

  test("GraftExtensions injects the full DFCompat surface at config time") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val names = org.apache.spark.sql.graftaccess.Internals
      .injectedFunctionNames(ext)
    assert(names.contains("date_bin") && names.contains("strpos") &&
      names.contains("regexp_match") && names.size >= 30)
  }

  test("empty results still carry their schema (lib.rs:282-286)") {
    val (_, rows) = engine.executeQuery(token,
      "SELECT id AS a, 'x' AS b FROM range(10) WHERE id < 0")
    assert(rows.isEmpty)
    val (h, schema) = engine.prepare(token,
      "SELECT id AS a, 'x' AS b FROM range(10) WHERE id < 0")
    assert(schema.fieldNames.toSeq == Seq("a", "b"))
    engine.closeStatement(h)
  }

  test("per-session scalar UDF registration (§2.12 surface)") {
    engine.session(token).udf.register("plus_one", (x: Int) => x + 1)
    val (_, rows) = engine.executeQuery(token, "SELECT plus_one(41) AS v")
    assert(rows.head.getInt(0) == 42)
  }

  test("env-backed current_schema/current_database shims (lib.rs:106-128)") {
    val (_, rows) = engine.executeQuery(token,
      "SELECT current_schema() AS cs, current_database() AS cd")
    assert(rows.head.getString(0) == sys.env.getOrElse("CURRENT_SCHEMA", "public"))
    assert(rows.head.getString(1) == sys.env.getOrElse("CURRENT_DATABASE", "datafusion"))
  }

  test("object-store env contract maps onto s3a conf (main.rs:46-71)") {
    import graft.engine.ObjectStoreConf
    val env = Map(
      "BUCKET" -> "lake", "AWS_ACCESS_KEY_ID" -> "ak",
      "AWS_SECRET_ACCESS_KEY" -> "sk", "AWS_ENDPOINT" -> "http://minio:9000",
      "AWS_ALLOW_HTTP" -> "TRUE")
    val applied = ObjectStoreConf.applyEnv(engine.session(token), env).toMap
    assert(applied("fs.s3a.access.key") == "ak")
    assert(applied("fs.s3a.endpoint") == "http://minio:9000")
    assert(applied("fs.s3a.connection.ssl.enabled") == "false")
    val hc = engine.session(token).sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.secret.key") == "sk")
    assert(ObjectStoreConf.warehouseRoot(env) == "s3a://lake/warehouse")
    // missing creds → local fallback, nothing applied (reference: InMemory)
    assert(ObjectStoreConf.applyEnv(engine.session(token), Map("BUCKET" -> "x")).isEmpty)
    assert(!ObjectStoreConf.warehouseRoot(Map.empty).startsWith("s3a://"))
  }

  test("EXPLAIN ANALYZE executes and reports runtime metrics per node") {
    val (_, rows) = engine.executeQuery(token,
      "EXPLAIN ANALYZE SELECT id FROM range(100) WHERE id > 50")
    val text = rows.map(_.getString(0)).mkString("\n")
    assert(text.contains("numOutputRows="), text.take(400))
    assert(text.contains("Range"), text.take(400))
    // the metric VALUES are real (the filter's input range produced 100)
    assert(text.contains("numOutputRows=100"), text.take(400))
  }

  test("prepare reports the result schema for parameterized text (lib.rs:702-708)") {
    // Reference returns the plan's schema at prepare even with $n
    // placeholders (typed Utf8); here the text plans with Utf8 dummies.
    val (h, schema) = engine.prepare(token,
      "SELECT ? AS a, upper(?) AS b, length(?) AS c")
    assert(schema.fieldNames.toSeq == Seq("a", "b", "c"))
    assert(schema("a").dataType.typeName == "string")
    engine.closeStatement(h)
    // placeholders inside string literals don't count
    val (h2, s2) = engine.prepare(token, "SELECT '?' AS lit, ? AS p")
    assert(s2.fieldNames.toSeq == Seq("lit", "p"))
    engine.closeStatement(h2)
    // genuinely unplannable text still degrades to an empty schema
    val (h3, s3) = engine.prepare(token, "SELECT * FROM no_such_table_xyz")
    assert(s3.isEmpty)
    engine.closeStatement(h3)
  }

  test("prepare of parameterized DML must not execute (no dummy-bind writes)") {
    engine.executeUpdate(token,
      "CREATE OR REPLACE TEMPORARY VIEW dml_probe_src AS SELECT 1 AS v")
    val dir = java.nio.file.Files.createTempDirectory("graft_dml_probe")
    engine.executeUpdate(token,
      s"CREATE TABLE dml_probe (v INT) USING parquet LOCATION '$dir'")
    try {
      // prepare alone must leave the table untouched (commands execute
      // eagerly at sql(), so dummy-binding INSERT text would write rows)
      val (h, schema) = engine.prepare(token,
        "INSERT INTO dml_probe SELECT length(?) AS v")
      assert(schema.isEmpty) // DML: schema stays empty, like before
      val (_, rows0) = engine.executeQuery(token,
        "SELECT count(*) AS n FROM dml_probe")
      assert(rows0.head.getLong(0) == 0L,
        "prepare must not have inserted anything")
      engine.closeStatement(h)
    } finally engine.executeUpdate(token, "DROP TABLE IF EXISTS dml_probe")
  }

  test("GCS env contract maps onto gs conf; S3 wins when both present (Cargo.toml:11)") {
    import graft.engine.ObjectStoreConf
    val gcsEnv = Map("BUCKET" -> "lake",
      "GOOGLE_SERVICE_ACCOUNT" -> "/secrets/sa.json")
    val applied = ObjectStoreConf.applyEnv(engine.session(token), gcsEnv).toMap
    assert(applied("fs.gs.auth.service.account.json.keyfile") == "/secrets/sa.json")
    assert(applied.contains("fs.gs.impl"))
    assert(ObjectStoreConf.warehouseRoot(gcsEnv) == "gs://lake/warehouse")
    // aws-before-gcp builder order: the S3 triple takes precedence
    val both = gcsEnv ++ Map("AWS_ACCESS_KEY_ID" -> "ak",
      "AWS_SECRET_ACCESS_KEY" -> "sk")
    assert(ObjectStoreConf.warehouseRoot(both) == "s3a://lake/warehouse")
    assert(!ObjectStoreConf.applyEnv(engine.session(token), both).toMap
      .contains("fs.gs.impl"))
    // a service account without a bucket is NOT enough
    assert(ObjectStoreConf.applyEnv(engine.session(token),
      Map("GOOGLE_SERVICE_ACCOUNT" -> "/x.json")).isEmpty)
  }

  test("TIME type rejects with a clean diagnostic (SURVEY §1.2: no TIME in Spark)") {
    val e = intercept[Exception] {
      engine.executeQuery(token, "SELECT TIME'12:34:56' AS t")
    }
    assert(e.getMessage.contains("UNSUPPORTED_TIME_TYPE"),
      s"expected the documented rejection, got: ${e.getMessage.take(200)}")
  }

  test("Decimal256 precision rejects with Spark's clean diagnostic " +
      "(SURVEY §1.2: max precision 38 = Decimal128)") {
    val e = intercept[Exception] {
      engine.executeQuery(token, "SELECT CAST(1 AS DECIMAL(50, 2)) AS d")
    }
    assert(e.getMessage.contains("DECIMAL_PRECISION_EXCEEDS_MAX_PRECISION"),
      s"expected the max-precision rejection, got: ${e.getMessage.take(200)}")
  }

  test("SIMILAR TO rewrites to anchored RLIKE with SQL-standard semantics") {
    def vals(sql: String): Seq[String] =
      engine.executeQuery(token, sql)._2.map(_.getString(0)).toSeq
    // % and _ are wildcards; the match is full-string
    assert(vals("SELECT v FROM VALUES ('abc'),('a.c'),('axcy'),('ac') AS " +
      "t(v) WHERE v SIMILAR TO 'a%c' ORDER BY v") == Seq("a.c", "abc", "ac"))
    // '.' is a LITERAL character, unlike a bare regex
    assert(vals("SELECT v FROM VALUES ('abc'),('a.c') AS t(v) " +
      "WHERE v SIMILAR TO 'a.c'") == Seq("a.c"))
    // alternation, bracket classes, _ keep their meaning; NOT negates
    assert(vals("SELECT v FROM VALUES ('grape'),('green'),('bloke'),('glue') " +
      "AS t(v) WHERE v SIMILAR TO '(gr|bl)[a-u]_e' ORDER BY v") ==
      Seq("bloke", "grape"))
    assert(vals("SELECT v FROM VALUES ('abc'),('xyz') AS t(v) " +
      "WHERE v NOT SIMILAR TO '%b%'") == Seq("xyz"))
    // text without the operator is untouched
    assert(Engine.rewriteSimilarTo("SELECT 'SIMILAR' AS s") ==
      "SELECT 'SIMILAR' AS s")
  }

  test("SIMILAR TO rewrite is literal-, identifier- and comment-aware") {
    // operator text INSIDE a string literal passes through unchanged
    val lit = "SELECT 'a SIMILAR TO ''b''' AS s"
    assert(Engine.rewriteSimilarTo(lit) == lit)
    val lineC = "SELECT 1 AS x -- note: SIMILAR TO 'y' here\nFROM t"
    assert(Engine.rewriteSimilarTo(lineC) == lineC)
    val blockC = "SELECT 1 AS x /* v SIMILAR TO 'y' */ FROM t"
    assert(Engine.rewriteSimilarTo(blockC) == blockC)
    val quotedId = "SELECT \"v SIMILAR TO 'y'\" FROM t"
    assert(Engine.rewriteSimilarTo(quotedId) == quotedId)
    // a REAL operator after a literal containing the text still rewrites
    val mixed = Engine.rewriteSimilarTo(
      "SELECT v FROM t WHERE note = 'x SIMILAR TO y' AND v SIMILAR TO 'a%'")
    assert(mixed.contains("note = 'x SIMILAR TO y'"), mixed)
    // a backslash-escaped quote must not end the literal span early
    // (Spark's default parser accepts 'don\'t'): the literal is copied
    // verbatim, the REAL operator after it still rewrites
    val bs = Engine.rewriteSimilarTo(
      "SELECT v FROM t WHERE note = 'don\\'t SIMILAR TO y' AND v SIMILAR TO 'a%'")
    assert(bs.contains("note = 'don\\'t SIMILAR TO y'"), bs)
    assert(bs.contains("RLIKE"), bs)
    assert(mixed.contains("RLIKE") && !mixed.toLowerCase.endsWith("'a%'"), mixed)
    // word boundary: `dissimilar` is not the keyword
    val wb = Engine.rewriteSimilarTo("SELECT dissimilar FROM t WHERE v SIMILAR TO 'a'")
    assert(wb.startsWith("SELECT dissimilar FROM t WHERE v RLIKE"), wb)
    // end-to-end through the engine: the literal survives execution
    val (_, rows) = engine.executeQuery(token, "SELECT 'a SIMILAR TO b' AS s")
    assert(rows.head.getString(0) == "a SIMILAR TO b")
  }

  test("SIMILAR TO ESCAPE clause declares the escape character") {
    def vals(sql: String): Seq[String] =
      engine.executeQuery(token, sql)._2.map(_.getString(0)).toSeq
    // '#'-escaped % is a literal percent, not a wildcard
    assert(vals("SELECT v FROM VALUES ('a%c'),('abc') AS t(v) " +
      "WHERE v SIMILAR TO 'a#%c' ESCAPE '#'") == Seq("a%c"))
    // escape + escape = the literal escape character
    assert(vals("SELECT v FROM VALUES ('a#c'),('abc') AS t(v) " +
      "WHERE v SIMILAR TO 'a##c' ESCAPE '#'") == Seq("a#c"))
    // under a custom escape, a bare backslash is an ordinary character
    assert(vals("SELECT v FROM VALUES (concat('a', chr(92), 'c')),('abc') " +
      "AS t(v) WHERE v SIMILAR TO 'a\\c' ESCAPE '#'") == Seq("a\\c"))
    // a quoted quote inside the pattern round-trips (doubled encoding)
    assert(vals("SELECT v FROM VALUES ('it''s'),('its') AS t(v) " +
      "WHERE v SIMILAR TO 'it''s'") == Seq("it's"))
  }

  test("SIMILAR TO bracket classes handle the ]-forms") {
    def vals(sql: String): Seq[String] =
      engine.executeQuery(token, sql)._2.map(_.getString(0)).toSeq
    // POSIX literal-] form: `[]]` is a class containing one `]`
    assert(vals("SELECT v FROM VALUES (']'),('x') AS t(v) " +
      "WHERE v SIMILAR TO '[]]'") == Seq("]"))
    // negated form `[^]]`: any single char except `]`
    assert(vals("SELECT v FROM VALUES (']'),('x') AS t(v) " +
      "WHERE v SIMILAR TO '[^]]'") == Seq("x"))
    // escaped `]` inside a class does NOT close it
    assert(vals("SELECT v FROM VALUES ('a'),(']'),('c') AS t(v) " +
      "WHERE v SIMILAR TO '[a\\]b]' ORDER BY v") == Seq("]", "a"))
  }

  test("fetchArrow returns a readable Arrow IPC stream (lib.rs:288-295)") {
    val (h, _) = engine.prepare(token,
      "SELECT id, concat('n', CAST(id AS STRING)) AS name FROM range(5)")
    engine.execute(h)
    val bytes = engine.fetchArrow(h)
    engine.closeStatement(h)
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getRowCount == 5)
      assert(root.getSchema.getFields.size() == 2)
      val ids = root.getVector("id").asInstanceOf[org.apache.arrow.vector.BigIntVector]
      assert((0 until 5).map(ids.get) == Seq(0L, 1L, 2L, 3L, 4L))
      val names = root.getVector("name").asInstanceOf[org.apache.arrow.vector.VarCharVector]
      assert(new String(names.get(3)) == "n3")
      assert(!reader.loadNextBatch()) // EOS after the single batch
    } finally { reader.close(); alloc.close() }
  }

  test("fetchArrow chunks large results into multiple record batches") {
    engine.session(token).conf
      .set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try {
      val (h, _) = engine.prepare(token, "SELECT id FROM range(250)")
      engine.execute(h)
      val bytes = engine.fetchArrow(h)
      engine.closeStatement(h)
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        var batches = 0
        var total = 0L
        while (reader.loadNextBatch()) {
          batches += 1
          total += reader.getVectorSchemaRoot.getRowCount
        }
        assert(batches == 3, s"expected 100+100+50 batches, got $batches")
        assert(total == 250L)
      } finally { reader.close(); alloc.close() }
    } finally engine.session(token).conf
      .unset("spark.sql.execution.arrow.maxRecordsPerBatch")
  }

  test("fetchArrow encodes ONCE: repeat fetches return the cached bytes; " +
      "re-execute invalidates (VERDICT r8 #3)") {
    engine.session(token).conf
      .set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try {
      val (h, _) = engine.prepare(token, "SELECT id FROM range(250)")
      engine.execute(h)
      val first = engine.fetchArrow(h)
      // the SAME array instance — the encode ran once, later fetches are
      // cache hits (the reference caches encoded batches, lib.rs:333-344)
      assert(engine.fetchArrow(h) eq first)
      val (bytes, offsets) = engine.fetchArrowFramed(h)
      assert(bytes eq first)
      // frame boundaries: schema message + 3 batches (100+100+50, EOS on
      // the last) — strictly increasing, ending at the stream length
      assert(offsets.length == 4, offsets.mkString(","))
      assert(offsets.last == bytes.length)
      assert(offsets.toSeq == offsets.toSeq.sorted.distinct)
      // each slice is a standalone IPC message; concatenation decodes as
      // the identical stream (what a DoGet client reassembles)
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        var total = 0L
        var batches = 0
        while (reader.loadNextBatch()) {
          batches += 1; total += reader.getVectorSchemaRoot.getRowCount
        }
        assert(batches == 3 && total == 250L)
      } finally { reader.close(); alloc.close() }
      // re-execute refreshes the result → the cached encoding is dropped
      engine.execute(h)
      assert(!(engine.fetchArrow(h) eq first))
      engine.closeStatement(h)
    } finally engine.session(token).conf
      .unset("spark.sql.execution.arrow.maxRecordsPerBatch")
  }

  /** Call sites of every Spark job started while `body` runs. The
    * listener bus is async but FIFO: a uniquely-described marker job is
    * run after `body`, and once its start event is visible every event
    * from `body` has been delivered too. */
  private def jobCallSitesDuring(body: => Unit): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val spark = TestSpark.spark
    val sc = spark.sparkContext
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        seen.add((
          Option(js.properties.getProperty("callSite.short")).getOrElse(""),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
    }
    sc.addSparkListener(listener)
    try {
      body
      sc.setJobDescription("graft-bus-marker")
      try spark.range(1).count() finally sc.setJobDescription(null)
      val deadline = System.currentTimeMillis() + 30000
      while (!seen.asScala.exists(_._2 == "graft-bus-marker") &&
        System.currentTimeMillis() < deadline) Thread.sleep(10)
      seen.asScala.toSeq.filterNot(_._2 == "graft-bus-marker").map(_._1)
    } finally sc.removeSparkListener(listener)
  }

  test("fetchArrow serves the cached execute() result — repeatable read, " +
      "no second execution (lib.rs:288-295)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fetch_cache")
    engine.executeUpdate(token,
      s"CREATE TABLE fetch_cache_t (v INT) USING parquet LOCATION '$dir'")
    try {
      engine.executeUpdate(token, "INSERT INTO fetch_cache_t VALUES (1), (2), (3)")
      val (h, _) = engine.prepare(token, "SELECT v FROM fetch_cache_t ORDER BY v")
      assert(engine.execute(h) == 3)
      // mutate the table AFTER execute: the cached result must not move
      engine.executeUpdate(token, "INSERT INTO fetch_cache_t VALUES (99)")
      var bytes: Array[Byte] = null
      val jobs = jobCallSitesDuring { bytes = engine.fetchArrow(h) }
      assert(jobs.isEmpty, s"fetchArrow must not launch Spark jobs, saw: $jobs")
      engine.closeStatement(h)
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        assert(reader.loadNextBatch())
        val root = reader.getVectorSchemaRoot
        val vs = root.getVector("v").asInstanceOf[org.apache.arrow.vector.IntVector]
        assert((0 until root.getRowCount).map(vs.get) == Seq(1, 2, 3),
          "fetchArrow must encode the pre-mutation cache, not re-execute")
      } finally { reader.close(); alloc.close() }
      // a fresh statement DOES see the mutation (the cache is per-statement)
      val (_, after) = engine.executeQuery(token,
        "SELECT count(*) AS n FROM fetch_cache_t")
      assert(after.head.getLong(0) == 4L)
    } finally engine.executeUpdate(token, "DROP TABLE IF EXISTS fetch_cache_t")
  }

  test("fetchArrow before execute raises like fetch") {
    val (h, _) = engine.prepare(token, "SELECT 1 AS v")
    intercept[IllegalStateException] { engine.fetchArrow(h) }
    engine.closeStatement(h)
  }

  test("first Arrow encode releases the Row array — single residency; " +
      "row fetch decodes from the cached bytes (VERDICT r9 #6)") {
    val (h, _) = engine.prepare(token,
      "SELECT id, CAST(id AS STRING) AS s, id * 2.5 AS d, id % 2 = 0 AS b," +
        " array(id, id + 1) AS arr FROM range(37)")
    engine.execute(h)
    assert(engine.rowsResident(h), "rows resident until the first encode")
    val (schema0, before) = engine.fetch(h)
    val first = engine.fetchArrow(h)
    assert(!engine.rowsResident(h), "encode must release the Row array")
    // repeat fetches still serve the identical cached bytes
    assert(engine.fetchArrow(h) eq first)
    assert(engine.fetchArrowFramed(h)._1 eq first)
    // row-shaped fetch after the release: decoded from the bytes,
    // value- and schema-identical to the pre-encode fetch
    val (schema1, after) = engine.fetch(h)
    assert(schema1 == schema0)
    assert(after.length == before.length)
    before.zip(after).foreach { case (a, b) =>
      assert(a.toSeq.map {
        case arr: scala.collection.Seq[_] => arr.toSeq
        case v => v
      } == b.toSeq.map {
        case arr: scala.collection.Seq[_] => arr.toSeq
        case v => v
      })
    }
    assert(!engine.rowsResident(h), "a row fetch must not re-pin the rows")
    // re-execute rebuilds rows and drops the stale encoding
    engine.execute(h)
    assert(engine.rowsResident(h))
    assert(!(engine.fetchArrow(h) eq first))
    engine.closeStatement(h)
  }

  test("executeUpdate never materializes result rows on the driver") {
    // query-shaped text runs distributed and drains on the executors:
    // a job starts, but never a driver-side `collect at` one
    val jobs = jobCallSitesDuring {
      assert(engine.executeUpdate(token, "SELECT id FROM range(100000)") == -1L)
    }
    assert(jobs.nonEmpty, "the statement must actually run")
    assert(!jobs.exists(_.startsWith("collect")),
      s"executeUpdate must not collect to the driver, saw: $jobs")
    // DML goes through the same path: the INSERT's own write job runs
    // (eagerly at sql()), with no collect job appended
    val dir = java.nio.file.Files.createTempDirectory("graft_upd_nocollect")
    engine.executeUpdate(token,
      s"CREATE TABLE upd_noc_t (v INT) USING parquet LOCATION '$dir'")
    try {
      val dmlJobs = jobCallSitesDuring {
        assert(engine.executeUpdate(token,
          "INSERT INTO upd_noc_t SELECT CAST(id AS INT) FROM range(1000)") == -1L)
      }
      assert(!dmlJobs.exists(_.startsWith("collect")),
        s"INSERT must not collect its command result, saw: $dmlJobs")
      val (_, n) = engine.executeQuery(token, "SELECT count(*) AS n FROM upd_noc_t")
      assert(n.head.getLong(0) == 1000L)
    } finally engine.executeUpdate(token, "DROP TABLE IF EXISTS upd_noc_t")
  }

  test("statement GC sweeps idle statements; fresh ones survive") {
    val (stale, _) = engine.prepare(token, "SELECT 1 AS a")
    Thread.sleep(30)
    val (fresh, _) = engine.prepare(token, "SELECT 2 AS b")
    assert(engine.gc(ttlMillis = 20) >= 1)
    intercept[IllegalArgumentException] { engine.execute(stale) }
    engine.execute(fresh) // still alive
    engine.closeStatement(fresh)
  }

  test("closing a session drops its statements and cached results") {
    val Right(t2) = engine.handshake("admin", "password")
    val (h, _) = engine.prepare(t2, "SELECT 42 AS v")
    engine.execute(h)
    engine.closeSession(t2)
    intercept[IllegalArgumentException] { engine.fetch(h) }
  }

  test("closeStatement auto-unpersists operator cache blocks (VERDICT r7 #4)") {
    import graft.operators.{Dedup, OperatorCache}
    val Right(t2) = engine.handshake("admin", "password")
    val s = engine.session(t2)
    import s.implicits._
    // a q_dedup_minhash-shaped corpus on the ENGINE's session, with
    // semiReduceBytes = 0 forcing the large-corpus path that persists
    // the candidate-pair block on top of the signature table
    val docs = (0L until 300L).map { i =>
      val fam = i % 3
      (i, s"alpha beta gamma delta epsilon zeta eta theta fam$fam " +
        s"iota kappa lambda mu nu xi omicron pi word${i % 5}")
    }.toDF("doc_id", "text")
    val rddsBefore = s.sparkContext.getPersistentRDDs.size
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.5, semiReduceBytes = 0L)
    pairs.createOrReplaceTempView("minhash_dups")
    assert(OperatorCache.trackedCount(s) > 0,
      "operator persists must register against the engine session")
    val (h, _) = engine.prepare(t2, "SELECT count(*) AS c FROM minhash_dups")
    assert(engine.execute(h) == 1L)
    assert(s.sparkContext.getPersistentRDDs.size > rddsBefore,
      "execute must have materialized cached blocks")
    engine.closeStatement(h)
    // every tracked block is dropped — executor storage back to baseline
    assert(OperatorCache.trackedCount(s) == 0)
    assert(s.sparkContext.getPersistentRDDs.size == rddsBefore)
    // recompute safety: the view still answers after the release
    val (_, rows) = engine.executeQuery(t2, "SELECT count(*) AS c FROM minhash_dups")
    assert(rows.head.getLong(0) >= 0L)
    assert(OperatorCache.trackedCount(s) == 0) // executeQuery closed its statement
    engine.closeSession(t2)
  }

  test("exact-multiple batch count: EOS rides the last batch frame, " +
      "no EOS-only tail frame (VERDICT r10 #4)") {
    engine.session(token).conf
      .set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try {
      val (h, _) = engine.prepare(token, "SELECT id FROM range(300)")
      engine.execute(h)
      val (bytes, offsets) = engine.fetchArrowFramed(h)
      // schema frame + 3 full batches of 100 — the LAST frame carries
      // both the final record batch and the EOS marker, per the
      // documented fetch_arrow_stream contract
      assert(offsets.length == 4, offsets.mkString(","))
      assert(offsets.last == bytes.length)
      // the final frame is a real batch (an EOS-only frame is 8 bytes)
      assert(offsets.last - offsets(offsets.length - 2) > 8)
      val alloc = new org.apache.arrow.memory.RootAllocator()
      val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
        new java.io.ByteArrayInputStream(bytes), alloc)
      try {
        var total = 0L; var batches = 0
        while (reader.loadNextBatch()) {
          batches += 1; total += reader.getVectorSchemaRoot.getRowCount
        }
        assert(batches == 3 && total == 300L)
      } finally { reader.close(); alloc.close() }
      engine.closeStatement(h)
    } finally engine.session(token).conf
      .unset("spark.sql.execution.arrow.maxRecordsPerBatch")
  }

  test("concurrent fetches race the encode-and-release transition " +
      "safely — one encode, no crash (ADVICE r10)") {
    val (h, _) = engine.prepare(token,
      "SELECT id, CAST(id AS STRING) AS s FROM range(5000)")
    engine.execute(h)
    val n = 16
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CountDownLatch(1)
    val done = new java.util.concurrent.CountDownLatch(n)
    (1 to n).foreach { i =>
      val t = new Thread(() => {
        try {
          start.await()
          // odd threads interleave a row-shaped fetch (which reads the
          // rows/ipc pair) with the arrow fetches driving the release
          if (i % 2 == 1) engine.fetch(h)
          results.add(engine.fetchArrow(h))
        } catch { case t: Throwable => errors.add(t) }
        finally done.countDown()
      })
      t.setDaemon(true); t.start()
    }
    start.countDown()
    assert(done.await(60, java.util.concurrent.TimeUnit.SECONDS))
    assert(errors.isEmpty, s"concurrent fetch crashed: ${errors.peek()}")
    // every thread observed the SAME cached encoding — exactly one encode
    val first = results.peek()
    results.forEach(b => assert(b eq first))
    engine.closeStatement(h)
  }

  test("statement GC releases the operator-cache blocks of swept " +
      "statements — dead-client reclamation (VERDICT r10 #1)") {
    import graft.operators.{Dedup, OperatorCache}
    val Right(t2) = engine.handshake("admin", "password")
    val s = engine.session(t2)
    import s.implicits._
    val docs = (0L until 300L).map { i =>
      val fam = i % 3
      (i, s"alpha beta gamma delta epsilon zeta eta theta fam$fam " +
        s"iota kappa lambda mu nu xi omicron pi word${i % 5}")
    }.toDF("doc_id", "text")
    val rddsBefore = s.sparkContext.getPersistentRDDs.size
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      threshold = 0.5, semiReduceBytes = 0L)
    pairs.createOrReplaceTempView("gc_minhash_dups")
    val (h, _) = engine.prepare(t2, "SELECT count(*) AS c FROM gc_minhash_dups")
    assert(engine.execute(h) == 1L)
    assert(s.sparkContext.getPersistentRDDs.size > rddsBefore,
      "execute must have materialized cached blocks")
    // the client dies HERE: no close_statement, no close_session, and a
    // socket disconnect closes nothing — the TTL sweep is the only path
    // back to baseline executor storage
    Thread.sleep(30)
    assert(engine.gc(ttlMillis = 20) >= 1)
    assert(OperatorCache.trackedCount(s) == 0,
      "gc must release the swept statement's operator cache")
    assert(s.sparkContext.getPersistentRDDs.size == rddsBefore,
      "executor storage must return to baseline after gc")
    intercept[IllegalArgumentException] { engine.fetch(h) }
    engine.closeSession(t2)
  }

  test("idle sessions are reclaimed by gcSessions; touched ones survive " +
      "(VERDICT r10 #1 session TTL)") {
    val Right(idle) = engine.handshake("admin", "password")
    val (orphan, _) = engine.prepare(idle, "SELECT 1 AS v")
    engine.execute(orphan)
    val Right(active) = engine.handshake("admin", "password")
    val Right(busy) = engine.handshake("admin", "password")
    val (bh, _) = engine.prepare(busy, "SELECT 2 AS v")
    engine.execute(bh) // run the job BEFORE the idle window
    Thread.sleep(350)
    // keep-alives AFTER the idle window — all cheap (no Spark jobs, so
    // none can stale past the TTL): a verb touch on the suite session
    // and `active`, and a STATEMENT touch on `busy` (statement activity
    // must count as session activity); `idle` gets nothing
    engine.session(token)
    engine.session(active)
    engine.bind(bh, Nil)
    assert(engine.gcSessions(ttlMillis = 300) >= 1)
    intercept[IllegalArgumentException] { engine.session(idle) }
    // the idle session's statements went with it (closeSession path)
    intercept[IllegalArgumentException] { engine.fetch(orphan) }
    engine.session(active) // survives: touched after the cutoff
    engine.fetch(bh)       // survives: statement touch after the cutoff
    engine.closeSession(active)
    engine.closeSession(busy)
  }

  test("cancel_query aborts a running statement from another thread " +
      "(reference stubs do_action_cancel_query, lib.rs:781-787)") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    // ~2·10^9 cheap evaluations pinned to TWO partitions: minutes
    // uncancelled (so a prompt return proves the cancel, not query
    // completion) while leaving 30 cores free — suites run in parallel
    // in this JVM and a 32-core storm here starves the TTL-timing tests
    val (h, _) = engine.prepare(token,
      "SELECT max(xxhash64(a.id * b.id)) AS m " +
        "FROM range(0, 20000000, 1, 2) a CROSS JOIN range(100) b")
    val started = System.nanoTime()
    val running = Future(engine.execute(h))
    // wait until the statement's job group has an active job
    val sc = TestSpark.spark.sparkContext
    val group = Engine.jobGroup(h) + "-1" // first execute attempt
    var waited = 0
    while (sc.statusTracker.getJobIdsForGroup(group).isEmpty && waited < 200) {
      Thread.sleep(50); waited += 1
    }
    assert(sc.statusTracker.getJobIdsForGroup(group).nonEmpty,
      "statement job never started")
    engine.cancelQuery(h)
    val err = intercept[Exception] { Await.result(running, 60.seconds) }
    val elapsedSec = (System.nanoTime() - started) / 1e9
    assert(elapsedSec < 60, s"cancel took ${elapsedSec}s")
    def msgs(t: Throwable): String =
      if (t == null) "" else t.getMessage + msgs(t.getCause)
    assert(msgs(err).toLowerCase.contains("cancel"), err.toString)
    // the handle survives cancellation and can run a fresh query
    engine.bind(h, Nil)
    intercept[IllegalStateException] { engine.fetch(h) } // never executed
    engine.closeStatement(h)
  }

  test("GRAFT_MAX_RESULT_ROWS fails an over-limit execute with a named " +
      "diagnostic; under-limit results are untouched (VERDICT r12 #2)") {
    sys.props("graft.max.result.rows") = "100"
    try {
      val (big, _) = engine.prepare(token, "SELECT id FROM range(101)")
      val err = intercept[IllegalStateException] { engine.execute(big) }
      assert(err.getMessage.contains("GRAFT_MAX_RESULT_ROWS=100"),
        err.getMessage)
      intercept[IllegalStateException] { engine.fetch(big) } // no result cached
      engine.closeStatement(big)
      val (ok, _) = engine.prepare(token,
        "SELECT id FROM range(100) ORDER BY id")
      assert(engine.execute(ok) == 100)
      val (_, rows) = engine.fetch(ok)
      assert(rows.map(_.getLong(0)).toSeq == (0L until 100L))
      engine.closeStatement(ok)
    } finally sys.props.remove("graft.max.result.rows")
  }

  test("GRAFT_MAX_RESULT_BYTES fails an oversized result before it " +
      "enters the statement cache") {
    sys.props("graft.max.result.bytes") = "4096"
    try {
      val (big, _) = engine.prepare(token,
        "SELECT repeat('x', 1000) AS s FROM range(100)")
      val err = intercept[IllegalStateException] { engine.execute(big) }
      assert(err.getMessage.contains("GRAFT_MAX_RESULT_BYTES=4096"),
        err.getMessage)
      engine.closeStatement(big)
      val (ok, _) = engine.prepare(token, "SELECT 1 AS one")
      assert(engine.execute(ok) == 1)
      engine.closeStatement(ok)
    } finally sys.props.remove("graft.max.result.bytes")
  }

  test("unlimited by default: a 200k-row result executes (reference " +
      "parity, lib.rs:333-344)") {
    val (h, _) = engine.prepare(token, "SELECT id FROM range(200000)")
    assert(engine.execute(h) == 200000)
    engine.closeStatement(h)
  }
}
