package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** M2 catalog parity: namespaces + schema'd tables + append-only INSERT,
  * all through SQL against the DSv2 MetaCatalog (SURVEY §1.1 row 1). */
class CatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    val wh = Files.createTempDirectory("graft_wh").toString
    s.conf.set("spark.sql.catalog.graft", "graft.catalog.MetaCatalog")
    s.conf.set("spark.sql.catalog.graft.warehouse", wh)
    s
  }

  test("namespace + table lifecycle through SQL") {
    spark.sql("CREATE NAMESPACE graft.db1")
    spark.sql("CREATE TABLE graft.db1.t (a INT, b STRING)")
    spark.sql("INSERT INTO graft.db1.t VALUES (1, 'x'), (2, 'y')")
    assert(spark.sql("SELECT * FROM graft.db1.t ORDER BY a")
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "x"), (2, "y")))

    // INSERT appends files, never rewrites (Iceberg-shaped semantics)
    spark.sql("INSERT INTO graft.db1.t VALUES (3, 'z')")
    assert(spark.sql("SELECT count(*) AS c FROM graft.db1.t")
      .collect().head.getLong(0) == 3)
  }

  test("filters and pruning push into the catalog table scan") {
    val plan = spark.sql(
      "SELECT a FROM graft.db1.t WHERE a > 1").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("IsNotNull(a)"),
      s"expected pushdown in plan:\n$plan")
  }

  test("SHOW TABLES / listTables sees catalog tables") {
    val tables = spark.sql("SHOW TABLES IN graft.db1").collect()
      .map(_.getString(1)).toSet
    assert(tables.contains("t"))
  }

  test("CTAS creates and populates") {
    spark.sql("CREATE TABLE graft.db1.t2 AS SELECT 41 + 1 AS answer")
    assert(spark.sql("SELECT answer FROM graft.db1.t2")
      .collect().head.getInt(0) == 42)
  }

  test("joins between catalog tables and temp views work") {
    Tables.register(spark, "/root/testdata/sf0.001")
    spark.sql("CREATE TABLE graft.db1.regions AS SELECT * FROM region")
    val n = spark.sql(
      """SELECT count(*) AS c FROM nation n
        |JOIN graft.db1.regions r ON n.n_regionkey = r.r_regionkey""".stripMargin)
      .collect().head.getLong(0)
    assert(n == 25)
  }

  test("rename and drop") {
    spark.sql("CREATE TABLE graft.db1.tmp (x INT)")
    spark.sql("ALTER TABLE graft.db1.tmp RENAME TO graft.db1.tmp2")
    assert(spark.sql("SHOW TABLES IN graft.db1").collect()
      .map(_.getString(1)).contains("tmp2"))
    spark.sql("DROP TABLE graft.db1.tmp2")
    spark.sql("DROP TABLE graft.db1.t2")
    val tables = spark.sql("SHOW TABLES IN graft.db1").collect()
      .map(_.getString(1)).toSet
    assert(!tables.contains("tmp2") && !tables.contains("t2"))
  }

  test("empty table scans cleanly with its declared schema") {
    spark.sql("CREATE TABLE graft.db1.empty (a INT, s STRING)")
    val df = spark.sql("SELECT a, s FROM graft.db1.empty")
    assert(df.schema.fieldNames.toSeq == Seq("a", "s"))
    assert(df.count() == 0)
  }
}
