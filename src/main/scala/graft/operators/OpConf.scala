package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared operator-level config lookups. */
private[graft] object OpConf {

  /** The session's shuffle parallelism, for EXPLICIT-count repartitions
    * (`repartition(N, cols…)` is exempt from AQE coalescing — the
    * STATUS round-10 lesson; a by-column repartition gets squeezed to a
    * handful of tasks whenever the shuffled BYTES are small, which
    * starves any stage whose per-ROW cost dominates: similarity-join
    * verifies, gram explodes, per-doc kernels). One copy of the lookup:
    * six operators used to hand-roll it. */
  def shufflePartitions(df: DataFrame): Int =
    scala.util.Try(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt).getOrElse(200)

  /** Spread `df` to the cluster's parallelism before a
    * cheap-bytes/expensive-rows KERNEL stage (gram explodes, per-doc
    * hashing — one or more md5s per input unit): a small local file
    * plans a handful of scan splits and serializes the kernel on them
    * (6 of 32 threads, 3.6× slower — measured round 14). CONDITIONAL
    * on the planned partition count, so a corpus whose scan already
    * splits finely — any real cluster table — never pays a
    * corpus-wide round-robin text shuffle for it; the exchange only
    * happens exactly when its bytes are small. */
  def spreadForKernel(df: DataFrame): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism
    // A plan that already SHUFFLES is at the session's shuffle
    // parallelism — no spread needed, and probing it with .rdd under
    // AQE would eagerly EXECUTE the upstream stages at construction
    // time (third-review finding). Only narrow (scan/filter/project)
    // plans consult .rdd, where partition planning runs no jobs.
    val hasShuffle = df.queryExecution.sparkPlan.collectFirst {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isDefined
    if (hasShuffle) df
    else if (df.rdd.getNumPartitions < par) df.repartition(par)
    else df
  }

  /** `a < b` by UNSIGNED UTF-8 BYTES (UTF8String.compareTo) — Spark's
    * sort order and DuckDB's binary string order; Java String.compareTo
    * (UTF-16 units) sorts supplementary characters differently and must
    * never decide a tie or fold order an oracle replays. ONE copy for
    * every driver-side argmax/sort that feeds an oracle. */
  def utf8Lt(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0
}
