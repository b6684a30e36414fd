package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.RestCatalogServer

/** REST catalog read path (the reference's second binary wires an Iceberg
  * REST catalog client into the same engine — rest/src/main.rs:42-117):
  * a MetaCatalog warehouse is served over HTTP by [[RestCatalogServer]]
  * and consumed read-only through `graft.catalog.RestCatalog`. */
class RestCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val w = Files.createTempDirectory("graft_rest_wh").toString
    spark.conf.set("spark.sql.catalog.rsrc", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.rsrc.warehouse", w)
    spark.sql("CREATE NAMESPACE rsrc.db")
    spark.sql("CREATE NAMESPACE rsrc.db.deep")
    spark.sql("CREATE TABLE rsrc.db.t (id BIGINT, name STRING)")
    spark.sql("INSERT INTO rsrc.db.t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("CREATE TABLE rsrc.db.deep.u (k INT)")
    spark.sql("INSERT INTO rsrc.db.deep.u VALUES (42)")
    w
  }

  private def withServer(f: Int => Unit): Unit = {
    val srv = new RestCatalogServer(Paths.get(wh), 0)
    srv.start()
    try f(srv.port) finally srv.stop()
  }

  test("SQL reads a REST-served warehouse: namespaces, tables, data, pushdown") {
    withServer { port =>
      spark.conf.set("spark.sql.catalog.rcat", "graft.catalog.RestCatalog")
      spark.conf.set("spark.sql.catalog.rcat.uri", s"http://127.0.0.1:$port")
      try {
        val ns = spark.sql("SHOW NAMESPACES IN rcat").collect()
          .map(_.getString(0)).toSet
        assert(ns.contains("db"))
        // top-level listing only — a recursive response would make
        // recursive clients (information_schema) double-count children
        assert(!ns.contains("db.deep"), ns.toString)
        val tables = spark.sql("SHOW TABLES IN rcat.db").collect()
          .map(_.getString(1)).toSet
        assert(tables == Set("t"))
        // data round-trips through the REST pointer + direct parquet scan
        val rows = spark.sql("SELECT id, name FROM rcat.db.t ORDER BY id")
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
        assert(rows == Seq((1L, "a"), (2L, "b"), (3L, "c")))
        // nested namespace table resolves too
        assert(spark.sql("SELECT k FROM rcat.db.deep.u").collect()
          .head.getInt(0) == 42)
        // pushdown survives the REST indirection (same GraftTable scan)
        val plan = spark.sql("SELECT id FROM rcat.db.t WHERE id > 1")
          .queryExecution.executedPlan.toString
        assert(plan.contains("PushedFilters"), plan.take(600))
        assert(plan.contains("GreaterThan(id,1)"), plan.take(600))
      } finally {
        spark.conf.unset("spark.sql.catalog.rcat")
        spark.conf.unset("spark.sql.catalog.rcat.uri")
      }
    }
  }

  test("REST catalog is read-only; missing tables 404 into NoSuchTable") {
    withServer { port =>
      spark.conf.set("spark.sql.catalog.rcat2", "graft.catalog.RestCatalog")
      spark.conf.set("spark.sql.catalog.rcat2.uri", s"http://127.0.0.1:$port")
      try {
        val w = intercept[Exception] {
          spark.sql("INSERT INTO rcat2.db.t VALUES (9, 'z')")
        }
        assert(w.getMessage.toLowerCase.contains("read-only") ||
          w.getMessage.contains("TABLE_OPERATION"), w.getMessage.take(300))
        val m = intercept[Exception] {
          spark.sql("SELECT * FROM rcat2.db.nope").collect()
        }
        assert(m.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
          m.getMessage.toLowerCase.contains("not found"), m.getMessage.take(300))
      } finally {
        spark.conf.unset("spark.sql.catalog.rcat2")
        spark.conf.unset("spark.sql.catalog.rcat2.uri")
      }
    }
  }
}
