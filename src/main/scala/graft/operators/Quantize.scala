package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage-side complement of
  * [[Pq]]'s codebook compression: 4× smaller than float32 with no
  * training artifact, the standard first rung of the 100 TB embedding
  * ladder (float32 → int8 → PQ). Symmetric per-vector scheme: scale =
  * max(|v_i|)/127, q_i = round-half-up(v_i/scale) ∈ [−127, 127], stored
  * as TINYINT. Zero vectors quantize to zeros with scale 0.
  *
  * Every step is same-operand IEEE arithmetic (abs, an order-insensitive
  * max, one division per element, +0.5, floor) — bit-identical across
  * engines, so the DuckDB oracle replays the full quantization
  * (FIXTURES.md recipes). Round-half-up via floor(x+0.5) rather than
  * round(): Spark's round is HALF_UP but DuckDB's rounds halves away
  * from zero — floor(x+0.5) sidesteps the divergence on negative halves.
  *
  * Pure projection: zero shuffle, codegen'd HOF-free math would need a
  * kernel, but quantization is a one-time write-path pass where the
  * parquet encode dominates — interpreted `transform` lambdas are fine
  * here (unlike the per-query search path, which uses kernels).
  */
object Quantize {

  private def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0d

  /** (id, scale, q): per-vector scale + TINYINT codes. */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = scaleOf(col(vecCol))
    df.select(col(idCol), s.as("scale"),
      transform(col(vecCol), x =>
        when(s === 0d, lit(0)).otherwise(
          floor(x.cast("double") / s + 0.5d)).cast("tinyint")).as("q"))
  }

  /** Reconstruct approximate float vectors: v̂_i = q_i · scale. */
  def dequantize(df: DataFrame, qCol: String, scaleCol: String,
      as: String): DataFrame =
    df.withColumn(as,
      transform(col(qCol), q => q.cast("double") * col(scaleCol)))

  /** Number of 32-bit sign words for a `dim`-wide vector. Words are 32
    * bits (not 64) so every packed value is a SMALL positive BIGINT —
    * no two's-complement sign-bit edge cases on either engine. */
  def binaryWords(dim: Int): Int = (dim + 31) / 32

  /** BINARY (1-bit sign) quantization — the bottom rung of the embedding
    * compression ladder (float32 → int8 ([[int8]]) → PQ ([[Pq]]) →
    * binary; Faiss's IndexBinaryFlat shape): bit j of word w is set iff
    * v[32w+j] > 0. 32× smaller than float32; Hamming distance between
    * codes (a handful of xor+popcount ops) approximates angular
    * distance, so a binary scan is the cheapest possible first-stage
    * filter — at 100 TB the codes column is GBs where the vectors are
    * TBs, and parquet column pruning means a code-only scan never
    * touches the float data.
    *
    * Output: (idCol, b0 .. b{words-1}) — flat BIGINT columns (join- and
    * codegen-friendly; no array wrapping). Sign comparisons only, no
    * arithmetic on the floats — trivially bit-identical cross-engine. */
  def binarySign(df: DataFrame, idCol: String, vecCol: String,
      dim: Int): DataFrame =
    df.select(col(idCol) +: binaryWordCols(col(vecCol), dim)
      .zipWithIndex.map { case (c, w) => c.as(s"b$w") }: _*)

  /** The unaliased word columns of [[binarySign]] — for callers that
    * attach codes alongside other projections (e.g. an IVF cell id) in
    * ONE corpus pass. */
  def binaryWordCols(vec: Column, dim: Int): Seq[Column] = {
    require(dim >= 1, s"need dim>=1; got $dim")
    (0 until binaryWords(dim)).map { w =>
      val bits = (0 until 32).filter(j => 32 * w + j < dim).map { j =>
        when(element_at(vec, 32 * w + j + 1) > 0f, lit(1L << j))
          .otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
  }

  /** The DuckDB replay of [[binarySign]]'s word columns: one explicit
    * CASE-term sum per word (same literals, same `> 0` sign test), for
    * composition into probe oracles. `vecSql` is the 1-based list
    * expression (e.g. `embedding`). */
  def binarySignOracleCols(vecSql: String, dim: Int): Seq[String] =
    (0 until binaryWords(dim)).map { w =>
      val terms = (0 until 32).filter(j => 32 * w + j < dim).map { j =>
        s"(CASE WHEN $vecSql[${32 * w + j + 1}] > 0 " +
          s"THEN CAST(${1L << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
      }
      s"(${terms.mkString(" + ")})"
    }
}
