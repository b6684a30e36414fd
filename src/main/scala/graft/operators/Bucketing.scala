package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-shuffled) tables for co-located joins.
  *
  * A join between two tables bucketed INTO THE SAME COUNT on their join
  * keys needs no exchange at all: every bucket i of one side joins only
  * bucket i of the other, and Spark's bucketed scan reports the hash
  * distribution so the planner drops both shuffles (and, with `sortBy`,
  * both sorts). That is the canonical 100 TB answer for fact tables that
  * are joined on the same key every day — pay the shuffle ONCE at write
  * time, never again at read time. This wraps Spark's native bucketing
  * (`DataFrameWriter.bucketBy` — hash = Murmur3, the same function the
  * exchange would use) rather than inventing a layout: the engine's SQL
  * surface equally accepts `CREATE TABLE ... CLUSTERED BY (k) INTO n
  * BUCKETS` against the session catalog.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table named `table` (external, under
    * `path`), replacing any previous definition. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, buckets: Int, path: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Bucket both join sides on their keys into the same bucket count and
    * return the bucketed re-reads. Idempotent per session: keyed on the
    * table names, re-used on the second call. */
  def ensureBucketed(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int,
      namePrefix: String = "graft_bucketed"): (DataFrame, DataFrame) = {
    val (lt, rt) = (s"${namePrefix}_l", s"${namePrefix}_r")
    if (!spark.catalog.tableExists(lt) || !spark.catalog.tableExists(rt)) {
      val base = Files.createTempDirectory("graft_buckets").toString
      writeBucketed(spark, left, lt, leftKey, buckets, s"$base/l")
      writeBucketed(spark, right, rt, rightKey, buckets, s"$base/r")
    }
    (spark.table(lt), spark.table(rt))
  }
}
