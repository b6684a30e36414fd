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
}
