package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional file clustering —
  * the layout that makes Parquet min/max stats prune on SEVERAL
  * predicate columns at once (a linear sort clusters only its leading
  * column; at 100 TB the difference is "skip 99% of files on either
  * predicate" vs "skip only on the sort key"). The same technique
  * Iceberg/Delta expose as `rewrite_data_files(strategy => 'sort',
  * sort_order => zorder(...))`.
  *
  * Everything here is a pure codegen'd column expression: range-quantize
  * each dimension to `bits` levels against its [lo, hi], then interleave
  * bit j of dimension i into position j·n+i of a single BIGINT. Sorting
  * by that key is what walks the space-filling curve.
  */
object ZOrder {

  /** Range quantization to [0, 2^bits): floor((v−lo)/(hi−lo)·(2^bits−1)),
    * clamped; a degenerate range maps to 0. floor-then-cast on BOTH
    * engines (DuckDB CAST rounds where Spark truncates). */
  def quantize(v: Column, lo: Double, hi: Double, bits: Int): Column = {
    val levels = (1L << bits) - 1
    val scaled =
      if (hi == lo) lit(0L)
      else floor((v.cast("double") - lit(lo)) / lit(hi - lo) * levels)
        .cast("long")
    least(greatest(scaled, lit(0L)), lit(levels))
  }

  /** Morton key over pre-quantized dimensions: bit j of dimension i lands
    * at position j·n+i. Bits are disjoint so + is |; n·bits must fit a
    * BIGINT (≤ 63). */
  def zkey(qs: Seq[Column], bits: Int): Column = {
    require(qs.nonEmpty && qs.size * bits <= 63,
      s"${qs.size} dims x $bits bits exceed a BIGINT")
    val n = qs.size
    val terms = for {
      (q, i) <- qs.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(shiftright(q, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_ + _)
  }

  /** Quantize + interleave against per-dimension [lo, hi] ranges. */
  def zkeyFor(cols: Seq[Column], ranges: Seq[(Double, Double)],
      bits: Int): Column =
    zkey(cols.zip(ranges).map { case (c, (lo, hi)) =>
      quantize(c, lo, hi, bits)
    }, bits)

  /** DuckDB equivalents (for the correctness oracle): identical
    * quantization arithmetic and bit positions. `lo`/`hi` are SQL
    * expressions so the oracle can derive ranges from the data exactly
    * like the Spark side does (min/max are order-insensitive, so both
    * engines feed identical doubles into identical arithmetic). */
  def quantizeOracleExpr(c: String, lo: String, hi: String,
      bits: Int): String = {
    val levels = (1L << bits) - 1
    s"least(greatest(CAST(floor((CAST($c AS DOUBLE) - $lo) / ($hi - $lo) * $levels) AS BIGINT), 0), $levels)"
  }

  def interleaveOracleExpr(qs: Seq[String], bits: Int): String = {
    val n = qs.size
    val terms = for {
      (q, i) <- qs.zipWithIndex
      j <- 0 until bits
    } yield s"((($q >> $j) & 1) << ${j * n + i})"
    s"CAST(${terms.mkString(" + ")} AS BIGINT)"
  }
}
