package graft

import org.apache.spark.sql.SparkSession

/** Inventory of UNPARTITIONED window operators (WindowExec's "No
  * Partition Defined ... single partition" warning) across every
  * declared query — optimization-round evidence (r19, VERDICT r18 #5):
  * a global window inside an OPERATOR would serialize a 100 TB stage on
  * one task, while one inside probe-input scaffolding or a probe's
  * determinism ORDER BY only ever sees probe-scale rows. This audit
  * walks each query's ANALYZED plan (no execution) and prints, per
  * query, every Window node with an empty partitionSpec plus its window
  * expressions, so each hit can be attributed in the report.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... tools/run.sh graft.WindowAudit
  */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var total = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, mk) =>
      try {
        val df = mk(spark, sfDir)
        val hits = df.queryExecution.analyzed.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ")
        }
        hits.foreach { h =>
          total += 1
          println(s"[window-audit] $name\t$h")
        }
      } catch {
        case e: Exception =>
          println(s"[window-audit] $name\tERROR ${e.getClass.getSimpleName}")
      } finally spark.catalog.clearCache()
    }
    println(s"[window-audit] TOTAL unpartitioned windows: $total")
    spark.stop()
  }
}
