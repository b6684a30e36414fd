package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source mixing for training-data assembly: sample each source to a
  * temperature-scaled share of a document budget — w_s ∝ n_s^α with
  * α < 1 upsampling tail sources (the standard multilingual/multi-corpus
  * mixing recipe, e.g. the α=0.3 exponent family popularized by
  * multilingual BERT/XLM-R; builder-prompt extension surface).
  *
  * Determinism contract (same trick as [[Similarity.kmeansFit]]):
  * per-source weights are QUANTIZED to int64 (round(n^α · 2^20)), summed
  * exactly, and each take count is floor(budget · w_q / Σw_q) — one
  * correctly-rounded IEEE division per source. α = 0.5 routes through
  * hardware sqrt (correctly rounded, unlike pow), so the DuckDB oracle
  * reproduces every take count bit-for-bit. Per-document selection is
  * rank-by-md5 — no float compares at the row level at all.
  */
object Mixing {

  /** (source, takeCount) from (source, rowCount): w = round(n^α·2^20),
    * take = floor(budget · w / Σw). Input order does not matter (integer
    * sum is associative). */
  def temperatureTakes(counts: Seq[(String, Long)], alpha: Double,
      budget: Long, quantBits: Int = 20): Seq[(String, Long)] = {
    val scale = (1L << quantBits).toDouble
    val wq = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, alpha)
      s -> math.round(w * scale)
    }
    val tot = wq.map(_._2).sum
    wq.map { case (s, w) =>
      s -> math.floor(budget.toDouble * w.toDouble / tot.toDouble).toLong
    }
  }

  /** Exact-take mix: per source, the first `take` documents in md5 order.
    * One count aggregate (k rows to the driver — the same bounded driver
    * traffic as any Lloyd round) + one window shuffle keyed on source.
    * A whale source serializes its rank into one task — at 100 TB prefer
    * [[hashMix]], which trades exact take sizes for zero shuffle. */
  def exactMix(df: DataFrame, idCol: String, srcCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val takes = sourceTakes(df, srcCol, alpha, budget)
    val takeCol = takes.foldRight(lit(0L): Column) { case ((s, t), els) =>
      when(col(srcCol) === s, lit(t)).otherwise(els)
    }
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= takeCol)
      .select(col(idCol), col(srcCol))
  }

  /** Scale-path mix: keep a document iff its 60-bit md5 value falls under
    * the source's sampling fraction take/n — a pure projection (zero
    * shuffle, partition-invariant), with take sizes exact in expectation
    * instead of exactly met. The spec pins the tolerance. */
  def hashMix(df: DataFrame, idCol: String, srcCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val fracs = sourceFracs(df, srcCol, alpha, budget)
    val fracCol = fracs.foldRight(lit(0.0): Column) {
      case ((s, t), els) => when(col(srcCol) === s, lit(t)).otherwise(els)
    }
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.filter(h.cast("double") / (1L << 60).toDouble < fracCol)
      .select(col(idCol), col(srcCol))
  }

  private def sourceTakes(df: DataFrame, srcCol: String, alpha: Double,
      budget: Long): Seq[(String, Long)] = {
    val counts = df.groupBy(col(srcCol)).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    temperatureTakes(counts, alpha, budget)
  }

  private def sourceFracs(df: DataFrame, srcCol: String, alpha: Double,
      budget: Long): Seq[(String, Double)] = {
    val counts = df.groupBy(col(srcCol)).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val takes = temperatureTakes(counts, alpha, budget).toMap
    counts.map { case (s, n) =>
      s -> math.min(1.0, takes(s).toDouble / n.toDouble)
    }
  }

  /** DuckDB replay of [[exactMix]] (α = 0.5 — hardware sqrt is correctly
    * rounded, so both engines compute identical quantized weights). */
  def exactMixOracleSql(table: String, idCol: String, srcCol: String,
      budget: Long, quantBits: Int = 20): String = {
    val scale = s"${1L << quantBits}.0"
    s"""WITH c AS (SELECT $srcCol, count(*) AS n FROM $table GROUP BY $srcCol),
       |w AS (SELECT $srcCol,
       |        CAST(round(sqrt(CAST(n AS DOUBLE)) * $scale) AS BIGINT) AS wq
       |      FROM c),
       |tk AS (SELECT $srcCol,
       |         CAST(floor(($budget.0 * wq) /
       |           CAST((SELECT sum(wq) FROM w) AS DOUBLE)) AS BIGINT) AS t
       |       FROM w),
       |r AS (SELECT $idCol, $srcCol,
       |        row_number() OVER (PARTITION BY $srcCol
       |          ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS rnk
       |      FROM $table)
       |SELECT r.$idCol, r.$srcCol FROM r JOIN tk USING ($srcCol)
       |WHERE rnk <= t
       |ORDER BY r.$idCol""".stripMargin
  }
}
