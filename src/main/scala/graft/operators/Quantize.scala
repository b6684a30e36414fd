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
}
