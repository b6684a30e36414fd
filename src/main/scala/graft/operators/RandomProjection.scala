package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftaccess.Internals

/** Sparse random projection (Johnson–Lindenstrauss via Achlioptas 2003):
  * reduce an embedding column to `outDim` dimensions through a constant
  * sign matrix with entries {+1, −1, 0} at probabilities
  * {1/6, 1/6, 2/3} — distances are preserved in expectation at 1/3 the
  * multiplies of a dense Gaussian matrix (the reference has no vector
  * surface at all, lib.rs:678; this is the standard pre-LSH/pre-IVF
  * dimensionality cut for 100 TB embedding corpora).
  *
  * Scale shape: the matrix is derived on the driver (O(outDim × inDim)
  * ints), shipped as a codegen constant, and applied as a shuffle-free
  * per-row projection — no join, no shuffle, one pass over the scan.
  *
  * Determinism/oracle: matrix entry (j, i) comes from the first
  * 8-hex-char slice of md5("j:i") mod 6 (0→+1, 1→−1, else 0 — the
  * [[graft.functions.CountMinSketch]] md5-slice recipe), and vectors
  * are quantized by floor(x·2^scaleBits) before all-integer
  * accumulation — both steps a DuckDB oracle replays bit-exactly.
  */
object RandomProjection {

  /** Deterministic Achlioptas sign matrix, outDim rows × inDim cols. */
  def signMatrix(outDim: Int, inDim: Int): Seq[Seq[Int]] =
    (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        val d = graft.functions.CountMinSketch.md5(
          s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        graft.functions.CountMinSketch.bucket(d, 0, 6) match {
          case 0 => 1
          case 1 => -1
          case _ => 0
        }
      }
    }

  /** (vec_id, proj array<long>) — the quantized projection. Integer
    * outputs; divide by 2^scaleBits (an exact power-of-two divide) for
    * the float view. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, inDim: Int, scaleBits: Int = 20): DataFrame =
    df.select(col(idCol).as("vec_id"),
      Internals.column(graft.functions.ProjectQuant(
        Internals.expression(col(vecCol)),
        signMatrix(outDim, inDim), scaleBits)).as("proj"))

  /** Float view of the projection (exact power-of-two divides) — feeds
    * the existing cosine-LSH / IVF paths on the reduced vectors. */
  def projectF(df: DataFrame, idCol: String, vecCol: String,
      outDim: Int, inDim: Int, scaleBits: Int = 20): DataFrame =
    project(df, idCol, vecCol, outDim, inDim, scaleBits)
      .select(col("vec_id"), transform(col("proj"),
        x => x.cast("double") / lit(java.lang.Math.scalb(1.0, scaleBits)))
        .as("proj"))

  /** DuckDB replay of [[project]] flattened to (vec_id, j, pj) rows. */
  def oracleSql(table: String, idCol: String, vecCol: String,
      outDim: Int, inDim: Int, scaleBits: Int = 20): String = {
    val scale = java.lang.Math.scalb(1.0, scaleBits).toLong
    def hex8(s: String): String =
      s"CAST(list_sum(list_transform(range(8), k -> " +
        s"CAST(instr('0123456789abcdef', substr($s, CAST(k AS INT)+1, 1)) - 1 " +
        s"AS BIGINT) << CAST(4*(7-k) AS BIGINT))) AS BIGINT)"
    s"""WITH e AS (SELECT $idCol AS vec_id,
       |    list_transform($vecCol::DOUBLE[],
       |      x -> CAST(floor(x * $scale.0) AS BIGINT)) AS q
       |  FROM $table),
       |m AS (SELECT j, i,
       |    CASE ${hex8(s"substr(md5(CAST(j AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 8)")} % 6
       |      WHEN 0 THEN 1 WHEN 1 THEN -1 ELSE 0 END AS s
       |  FROM range($outDim) t1(j) CROSS JOIN range($inDim) t2(i)),
       |u AS (SELECT vec_id, i, q[CAST(i AS INT) + 1] AS qi
       |  FROM e CROSS JOIN range($inDim) t(i)),
       |p AS (SELECT vec_id, j, CAST(sum(s * qi) AS BIGINT) AS pj
       |  FROM u JOIN m USING (i) GROUP BY vec_id, j)
       |SELECT vec_id, j, pj FROM p ORDER BY vec_id, j""".stripMargin
  }
}
