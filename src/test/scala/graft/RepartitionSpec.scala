package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `CALL system.repartition_table` — FULL partition-spec replacement,
  * the data-rewrite evolution path that (unlike metadata-only ADD/DROP
  * PARTITION FIELD) may introduce or dissolve IDENTITY fields: seals a
  * new spec era, then compact()s so every live file is rewritten under
  * the new layout. The mid-state between seal and rewrite must stay
  * read-consistent — old eras' files scan and prune under their own
  * specs (identity columns from dir inference or file bytes PER ERA,
  * slices name-aligned in MultiGenScans), new writes lay out the new
  * spec — and history keeps serving old eras after migration. */
class RepartitionSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft_repart").toString
    s.conf.set("spark.sql.catalog.rp", "graft.catalog.MetaCatalog")
    s.conf.set("spark.sql.catalog.rp.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS rp.db")
    s
  }

  private def tdir(name: String) = java.nio.file.Paths.get(
    spark.conf.get("spark.sql.catalog.rp.warehouse"), "db", name)

  private def dataFiles(name: String): Seq[String] =
    graft.catalog.Snapshots.latest(tdir(name)).get.dataFiles

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
    scans.map(_.metrics.get("numFiles").map(_.value).getOrElse(0L)).sum.toInt
  }

  test("unpartitioned → identity: one call seals + migrates; dirs appear, " +
      "prune works, history intact") {
    spark.sql("CREATE TABLE rp.db.toid (k BIGINT, region STRING, v DOUBLE)")
    spark.sql("""INSERT INTO rp.db.toid
      SELECT id, CASE WHEN id % 3 = 0 THEN 'emea'
                      WHEN id % 3 = 1 THEN 'apac' ELSE 'amer' END,
             CAST(id AS DOUBLE)
      FROM range(0, 30)""")
    val preV = graft.catalog.Snapshots.latest(tdir("toid")).get.version
    val res = spark.sql(
      "CALL rp.system.repartition_table('db.toid', 'region', 'k', 3)")
      .collect().head
    assert(res.getString(0) == "" || res.getString(0) == null ||
      !res.getString(0).contains("region"))
    assert(res.getString(1) == "region", res.toString)
    // migrated files live under region=... dirs
    assert(dataFiles("toid").nonEmpty &&
      dataFiles("toid").forall(_.contains("region=")),
      dataFiles("toid").toString)
    // contents identical
    assert(spark.sql("SELECT sum(k), count(*) FROM rp.db.toid")
      .collect().head.toSeq == Seq(435L, 30L))
    // identity pruning: a region predicate scans fewer files
    val one = spark.sql("SELECT count(*) FROM rp.db.toid WHERE region = 'emea'")
    assert(one.collect().head.getLong(0) == 10)
    assert(scanFiles(spark.sql("SELECT * FROM rp.db.toid WHERE region = 'emea'"))
      < dataFiles("toid").size)
    // history: the pre-repartition snapshot still reads the flat layout
    assert(spark.sql(
      s"SELECT count(*) FROM rp.db.toid VERSION AS OF $preV")
      .collect().head.getLong(0) == 30)
    // writes land under the new spec
    spark.sql("INSERT INTO rp.db.toid VALUES (100, 'emea', 1.0)")
    assert(spark.sql("SELECT count(*) FROM rp.db.toid WHERE region = 'emea'")
      .collect().head.getLong(0) == 11)
  }

  test("identity → hidden transform: the identity column dissolves back " +
      "into file bytes; mixed mid-state reads stay correct era by era") {
    spark.sql("""CREATE TABLE rp.db.fromid (k BIGINT, region STRING, v DOUBLE)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO rp.db.fromid
      SELECT id, CASE WHEN id % 2 = 0 THEN 'east' ELSE 'west' END,
             CAST(id AS DOUBLE)
      FROM range(0, 20)""")
    assert(dataFiles("fromid").forall(_.contains("region=")))

    // SEAL ONLY (no migration yet) — the mid-state the procedure
    // normally hides; every read path must stay correct on the mix
    graft.catalog.SpecEras.repartitionSpec(tdir("fromid"), "rp.db.fromid",
      Seq("bucket(4, k)"))
    // new write: k_bucket dirs, region in file bytes
    spark.sql("""INSERT INTO rp.db.fromid
      SELECT id, 'north', CAST(id AS DOUBLE) FROM range(100, 110)""")
    val mixed = dataFiles("fromid")
    assert(mixed.exists(_.contains("region=")) &&
      mixed.exists(_.contains("k_bucket=")), mixed.toString)
    // cross-era read serves the identity column from dirs (old era) and
    // bytes (new era) in ONE query
    assert(spark.sql("SELECT region, count(*) FROM rp.db.fromid GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("east", 10L), ("north", 10L), ("west", 10L)))
    // per-era pruning: region predicate prunes old-era dirs; k predicate
    // prunes new-era buckets
    assert(spark.sql("SELECT sum(k) FROM rp.db.fromid WHERE region = 'east'")
      .collect().head.getLong(0) == (0L until 20L by 2).sum)
    assert(spark.sql("SELECT count(*) FROM rp.db.fromid WHERE k = 105")
      .collect().head.getLong(0) == 1)
    // row-level command across the mix
    spark.sql("DELETE FROM rp.db.fromid WHERE k IN (3, 103)")
    assert(spark.sql("SELECT count(*) FROM rp.db.fromid")
      .collect().head.getLong(0) == 28)
    // equality-delete sidecar masks rows in BOTH eras (k lives in file
    // bytes on every era here; the mask is era-agnostic by key)
    locally {
      import spark.implicits._
      graft.catalog.Maintenance.deleteByKey(spark, "rp.db.fromid",
        Seq(5L, 105L).toDF("k"))
    }
    assert(spark.sql("SELECT count(*) FROM rp.db.fromid")
      .collect().head.getLong(0) == 26)
    assert(spark.sql("SELECT count(*) FROM rp.db.fromid WHERE k IN (5, 105)")
      .collect().head.getLong(0) == 0)

    // migrate; region= dirs disappear, values preserved in bytes
    graft.catalog.Maintenance.compact(spark, "rp.db.fromid", Seq("k"), 2)
    assert(dataFiles("fromid").forall(f =>
      f.contains("k_bucket=") && !f.contains("region=")),
      dataFiles("fromid").toString)
    // deleted: k=3,5 ('west'), k=103,105 ('north') — east keeps all 10
    assert(spark.sql("SELECT region, count(*) FROM rp.db.fromid GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("east", 10L), ("north", 8L), ("west", 8L)))
  }

  test("identity swap via procedure: region → days(ts) + MERGE across " +
      "the result") {
    spark.sql("""CREATE TABLE rp.db.swap (k BIGINT, region STRING, ts TIMESTAMP)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO rp.db.swap
      SELECT id, CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END,
             timestamp_seconds(1700000000 + id * 86400)
      FROM range(0, 10)""")
    spark.sql(
      "CALL rp.system.repartition_table('db.swap', 'days(ts)', 'k', 2)")
    assert(dataFiles("swap").forall(f =>
      f.contains("ts_day=") && !f.contains("region=")))
    spark.sql("""MERGE INTO rp.db.swap t
      USING (SELECT 4 AS k, 'updated' AS region,
                    timestamp_seconds(1700000000) AS ts) s
      ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET t.region = s.region
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT region FROM rp.db.swap WHERE k = 4")
      .collect().map(_.getString(0)).toSeq == Seq("updated"))
    // the ts predicate prunes day dirs on the new layout
    assert(spark.sql(
      "SELECT count(*) FROM rp.db.swap WHERE ts < timestamp_seconds(1700000000 + 86400)")
      .collect().head.getLong(0) == 1)
  }

  test("guards: unknown column, duplicate dirs, no-op spec, staged branch") {
    spark.sql("CREATE TABLE rp.db.g (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rp.db.g VALUES (1, 'x')")
    val e1 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.g', 'nope', 'k', 1)"))
    assert(e1.getMessage.contains("not in schema"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.g', 'bucket(4,k),bucket(8,k)', 'k', 1)"))
    assert(e2.getMessage.contains("duplicate"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.g', '', 'k', 1)"))
    assert(e3.getMessage.contains("already partitioned"), e3.getMessage)
    spark.sql("CALL rp.system.create_branch('db.g', 'st', 2)")
    val e4 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.g', 'bucket(4,k)', 'k', 1)"))
    assert(e4.getMessage.contains("branches"), e4.getMessage)
    spark.sql("CALL rp.system.drop_branch('db.g', 'st')")
  }

  test("bad compact args reject BEFORE the seal; a stranded seal " +
      "resumes through the same call; migrated same-spec stays a no-op") {
    spark.sql("CREATE TABLE rp.db.res (k BIGINT, v STRING)")
    spark.sql("INSERT INTO rp.db.res VALUES (1, 'x'), (2, 'y')")
    def eraCount: Int =
      graft.catalog.SpecEras.read(tdir("res")).map(_.size).getOrElse(0)
    // argument problems must not seal (a seal + failed compact would
    // strand the table; review finding)
    val e1 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.res', 'bucket(2,k)', '', 1)"))
    assert(e1.getMessage.contains("sort_cols"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.res', 'bucket(2,k)', 'nope', 1)"))
    assert(e2.getMessage.contains("not in the schema"), e2.getMessage)
    val e3 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.res', 'bucket(2,k)', 'k', 0)"))
    assert(e3.getMessage.contains("target_files"), e3.getMessage)
    assert(eraCount == 0, "a rejected call must not have sealed an era")
    // STRANDED state: the seal landed but the migration did not (a
    // transient compact failure) — re-running the SAME call finishes it
    graft.catalog.SpecEras.repartitionSpec(tdir("res"), "rp.db.res",
      Seq("bucket(2, k)"))
    assert(dataFiles("res").forall(!_.contains("k_bucket=")))
    spark.sql(
      "CALL rp.system.repartition_table('db.res', 'bucket(2,k)', 'k', 1)")
    assert(dataFiles("res").nonEmpty &&
      dataFiles("res").forall(_.contains("k_bucket=")))
    // fully migrated: the same call is a loud no-op again
    val e4 = intercept[Exception](spark.sql(
      "CALL rp.system.repartition_table('db.res', 'bucket(2,k)', 'k', 1)"))
    assert(e4.getMessage.contains("already partitioned"), e4.getMessage)
  }

  test("repartition to '' unpartitions an identity table") {
    spark.sql("""CREATE TABLE rp.db.unp (k BIGINT, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO rp.db.unp
      SELECT id, CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END
      FROM range(0, 8)""")
    spark.sql("CALL rp.system.repartition_table('db.unp', '', 'k', 1)")
    assert(dataFiles("unp").forall(!_.contains("region=")))
    assert(spark.sql("SELECT region, count(*) FROM rp.db.unp GROUP BY 1 ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("x", 4L), ("y", 4L)))
    // and a later write stays flat
    spark.sql("INSERT INTO rp.db.unp VALUES (50, 'x')")
    assert(spark.sql("SELECT count(*) FROM rp.db.unp WHERE region = 'x'")
      .collect().head.getLong(0) == 5)
  }

  test("schema generations × identity eras: a renamed column reads right " +
      "across slices whose ordinals AND names both differ") {
    spark.sql("""CREATE TABLE rp.db.genx (a BIGINT, b STRING, region STRING)
      PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO rp.db.genx
      SELECT id, concat('b', CAST(id AS STRING)),
             CASE WHEN id % 2 = 0 THEN 'p' ELSE 'q' END
      FROM range(0, 6)""")                                  // era 1, gen 1
    spark.sql("ALTER TABLE rp.db.genx RENAME COLUMN b TO label")  // gen 2
    graft.catalog.SpecEras.repartitionSpec(tdir("genx"), "rp.db.genx",
      Seq("bucket(2, a)"))                                  // era 2 sealed
    spark.sql("""INSERT INTO rp.db.genx
      SELECT id, concat('b', CAST(id AS STRING)), 'r'
      FROM range(10, 14)""")                                // era 2, gen 2
    // old slice: [a, label(from b), region(from dirs)]; new slice:
    // [a, label, region(bytes)] — ordinals and names both differ
    val rows = spark.sql(
      "SELECT a, label, region FROM rp.db.genx ORDER BY a")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.length == 10)
    assert(rows.take(6).forall { case (a, l, reg) =>
      l == s"b$a" && reg == (if (a % 2 == 0) "p" else "q") }, rows.toSeq)
    assert(rows.drop(6).forall { case (a, l, reg) =>
      l == s"b$a" && reg == "r" }, rows.toSeq)
    graft.catalog.Maintenance.compact(spark, "rp.db.genx", Seq("a"), 1)
    assert(spark.sql("SELECT count(*) FROM rp.db.genx WHERE region = 'r'")
      .collect().head.getLong(0) == 4)
  }
}
