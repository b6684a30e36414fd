package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // right-size the generated-class cache for a 200-probe run (the
      // 100-entry default thrashes: Janino recompiles + cold classes,
      // see Bench.scala round-11 note)
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_VERIFY_QUERIES=a,b narrows the dump (local diagnosis only;
    // the driver runs unfiltered).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_QUERIES").map(_.split(",").toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // Drop per-probe persist()s (operators cache intermediates and
      // never unpersist a lazily-returned result) so 128 sequential
      // probes don't accumulate dead cached blocks.
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // probe-count manifest (r18): tools/update_coverage.py regenerates
    // COVERAGE.md's totals line from this, so the header cannot drift
    // from the actual inventory (VERDICT r17 #8)
    val all = SparkEntry.queries.keySet
    val noOracle = (all -- SparkEntry.oracleSql.keySet).toSeq.sorted
    Files.writeString(Paths.get(s"$outDir/probe_counts.json"),
      s"""{"probes": ${all.size}, "oracle": ${SparkEntry.oracleSql.size}, """ +
        s""""no_oracle": [${noOracle.map(q).mkString(", ")}]}""")
    spark.stop()
  }
}
