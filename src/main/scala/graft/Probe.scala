package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One correctness probe: a named query plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against
  * (SURVEY §5 t2). Conventions (FIXTURES.md): total ORDER BY for
  * deterministic hashing; aggregate/computed columns aliased identically
  * on both sides because the driver sorts columns by name.
  */
final case class Probe(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Probe {
  /** SQL probe whose text is valid in both Spark SQL and DuckDB. */
  def sql(name: String, text: String): Probe =
    Probe(name, (s, dir) => { Tables.register(s, dir); s.sql(text) }, Some(text))

  /** SQL probe with dialect-divergent Spark / DuckDB texts. */
  def sql2(name: String, sparkText: String, duckText: String): Probe =
    Probe(name, (s, dir) => { Tables.register(s, dir); s.sql(sparkText) },
      Some(duckText))

  /** DataFrame-API probe with a DuckDB oracle. */
  def df(name: String, oracleText: String)(
      run: (SparkSession, String) => DataFrame): Probe =
    Probe(name, (s, dir) => { Tables.register(s, dir); run(s, dir) },
      Some(oracleText))

  /** Probe with no SQL-expressible oracle → driver does rows-only check. */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Probe =
    Probe(name, (s, dir) => { Tables.register(s, dir); run(s, dir) }, None)
}
