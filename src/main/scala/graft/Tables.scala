package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registers the driver-generated parquet tables (TESTDATA.md) as session
  * temp views and installs the DataFusion-compat function shims.
  *
  * Views are metadata-only: the parquet scan underneath keeps full predicate
  * pushdown / column pruning, so probes written as SQL over these views plan
  * identically to direct `spark.read.parquet` DataFrames. Registration is
  * cached per (session, dir) so each of the many probe queries pays the
  * parquet-footer schema read only once.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[(SparkSession, String)]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped as two physical types across testdata
      // generations: parquet TIMESTAMP(NANOS) — which Spark 4's reader
      // rejects outright (PARQUET_TYPE_ILLEGAL) unless read as raw longs —
      // and plain TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark
      // reads as TIMESTAMP_NTZ. Normalize both to session-tz TimestampType
      // (sessions run UTC, so the NTZ cast is value-preserving and matches
      // DuckDB's naive read). The nanos path truncates to µs with `div`
      // (toward zero) — identical to the DataFusion/Iceberg ns→µs floor
      // for the POST-EPOCH timestamps this testdata contains; a pre-epoch
      // (negative) nanosecond value would round 1µs differently and would
      // need integer floor math instead (SURVEY §1.2).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val tsExpr = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType => "timestamp_micros(ts div 1000)"
        case _ => "cast(ts as timestamp)"
      }
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(tsExpr))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Idempotent: register all test tables from `dir` in `spark`'s session.
    * Marks (session, dir) done only after every view registered, so a
    * transient failure doesn't poison later queries. */
  def register(spark: SparkSession, dir: String): Unit = {
    val key = (spark, dir)
    if (!registered.contains(key)) synchronized {
      if (!registered.contains(key)) {
        DFCompat.install(spark)
        names.foreach { n => load(spark, dir, n).createOrReplaceTempView(n) }
        registered.add(key)
      }
    }
  }
}
