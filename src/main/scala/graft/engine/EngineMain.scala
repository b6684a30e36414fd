package graft.engine

import org.apache.spark.sql.SparkSession

import graft.Tables

/** CLI entry point for the engine — the offline analogue of the
  * reference's server binaries (iceberg-datafusion-arrow-flight-sql/
  * src/main.rs:41-100): handshake → prepare → execute → fetch, printing
  * rows. Usage:
  *
  *   EngineMain <sfDir> "<sql>" ["<sql>" ...]
  *
  * Each argument is one statement run in the same session (DDL/DML
  * flows); the LAST statement's result is printed. GRAFT_PARAMS=a,b binds
  * positional string parameters to the last statement. Auth comes from
  * FLIGHT_USER/FLIGHT_PASSWORD (default admin/password), exactly like the
  * reference's env-driven config (README.md:5-19).
  */
object EngineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: EngineMain <sfDir> <sql> [<sql> ...]")
    val sfDir = args(0)
    val stmts = args.drop(1).toSeq
    val sql = stmts.last
    val params = sys.env.get("GRAFT_PARAMS")
      .map(_.split(",").toSeq).getOrElse(Nil)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val engine = new Engine(spark)
    val token = engine.handshake(
      sys.env.getOrElse("FLIGHT_USER", "admin"),
      sys.env.getOrElse("FLIGHT_PASSWORD", "password")) match {
      case Right(t) => t
      case Left(err) => System.err.println(err); sys.exit(1); ""
    }

    Tables.register(engine.session(token), sfDir)

    stmts.init.foreach { s => engine.executeUpdate(token, s) }

    val (handle, schema) = engine.prepare(token, sql)
    if (params.nonEmpty) engine.bind(handle, params)
    val n = engine.execute(handle)
    val (outSchema, rows) = engine.fetch(handle)
    val names = if (outSchema.nonEmpty) outSchema else schema
    println(names.fieldNames.mkString("\t"))
    rows.take(50).foreach(r => println(r.toSeq.mkString("\t")))
    if (n > 50) println(s"... ($n rows total)")
    engine.closeStatement(handle)
    engine.closeSession(token)
    spark.stop()
  }
}
