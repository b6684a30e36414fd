package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization — the compression half of the production ANN
  * stack (IVF-PQ, Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each vector into M subvectors,
  * vector-quantize every subspace against its own k-entry codebook, and
  * search with per-query lookup tables over the codes. At 100 TB this is
  * what makes ANN feasible at all — a 64-dim float32 corpus shrinks from
  * 256 B/vector to M bytes (32× here), and the scored side of the search
  * never touches the original vectors.
  *
  * Spark shapes:
  *  - TRAIN: [[Similarity.kmeansFit]] per subspace slice — inherits its
  *    determinism (quantized-int64 means, bit-identical under any
  *    partitioning);
  *  - ENCODE: a pure projection. argmin‖x−c‖ is computed by the existing
  *    ArgMaxDot kernel via the augmentation trick: append 1.0 to x and
  *    −‖c‖²/2 to each centroid, then argmax dot((x,1),(c,−‖c‖²/2)) =
  *    argmax x·c − ‖c‖²/2 = argmin‖x−c‖². No new kernel, still one pass,
  *    still codegen;
  *  - SEARCH (MIPS-ADC): each query precomputes an M×k lookup table ONCE
  *    in its own projection (M·k small dots), the broadcast join then
  *    scores a candidate with M array lookups + M−1 adds — the asymmetric
  *    distance computation, with the LUT riding the broadcast instead of
  *    being rebuilt per pair.
  */
object Pq {

  /** M codebooks of k centroids each, trained per subspace slice. */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int, iters: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    (0 until m).map { s =>
      Similarity.kmeansFit(
        df.select(col(idCol), slice(col(vecCol), s * sub + 1, sub).as("__v")),
        idCol, "__v", k, iters)
    }
  }

  /** Untrained codebooks (first-k slices, the [[Similarity.ivfCentroidsFrom]]
    * analogue) — deterministic without a training pass; the cross-engine
    * oracle recomputes them from the table itself. */
  def pqCodebooksFrom(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val firstK = df.orderBy(col(idCol)).limit(k).select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    (0 until m).map(s => firstK.map(v => v.slice(s * sub, (s + 1) * sub)))
  }

  /** Per-subspace code column: argmin L2 against the codebook via the
    * augmentation trick (exactly one ArgMaxDot kernel pass). */
  private def codeExpr(vec: Column, cb: Seq[Seq[Double]], s: Int,
      sub: Int): Column = {
    val aug = cb.map(c => c :+ (-c.map(x => x * x).sum / 2.0))
    Similarity.ivfCellExpr(
      concat(slice(vec, s * sub + 1, sub), array(lit(1.0f))), aug)
  }

  /** Encode every vector to M small codes — a pure projection, output
    * M·4 bytes of codes per row (int columns c0..c{M-1}). */
  def pqEncode(df: DataFrame, idCol: String, vecCol: String,
      codebooks: Seq[Seq[Seq[Double]]]): DataFrame = {
    val sub = codebooks.head.head.size
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      codeExpr(col(vecCol), cb, s, sub).as(s"c$s")
    }
    df.select(col(idCol).as("vec_id") +: codes: _*)
  }

  /** MIPS-ADC top-k: approximate inner-product scores from codes only.
    * The corpus side carries codes (M ints); each query's M×k LUT is
    * computed once in the query projection and broadcast with it. */
  def pqAdcTopK(queries: DataFrame, encoded: DataFrame, idCol: String,
      vecCol: String, codebooks: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    val sub = codebooks.head.head.size
    val luts = codebooks.zipWithIndex.map { case (cb, s) =>
      array(cb.map(c => Similarity.dotKernel(
        slice(col("qv"), s * sub + 1, sub), typedLit(c))): _*).as(s"lut$s")
    }
    val q = queries.select(
      Seq(col(idCol).as("qid"), col(vecCol).as("qv")) ++ luts: _*)
    val score = codebooks.indices
      .map(s => element_at(col(s"lut$s"), col(s"c$s") + 1))
      .reduce(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid"))
    encoded.withColumnRenamed("vec_id", "nid")
      .join(broadcast(q), col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-PQ composed end-to-end — the production ANN layout (Jégou et
    * al. §IV): coarse-quantize the corpus into IVF cells AND encode it
    * to PQ codes in ONE projection, route each query to its `nprobe`
    * best cells, and ADC-score only the routed candidates from codes.
    * The plan has exactly one join: corpus (nid, cell, c0..c{M-1}) ⨝
    * broadcast queries (probe cells + M×k LUTs, both computed once in
    * the query projection). At 100 TB the scored side carries M bytes
    * of codes per row, touches nprobe/nCells of the corpus, and never
    * reads the original vectors. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[Seq[Double]],
      codebooks: Seq[Seq[Seq[Double]]], nprobe: Int, k: Int): DataFrame = {
    val sub = codebooks.head.head.size
    val codes = codebooks.zipWithIndex.map { case (cb, s) =>
      codeExpr(col(vecCol), cb, s, sub).as(s"c$s")
    }
    val enc = corpus.select(Seq(col(idCol).as("nid"),
      Similarity.ivfCellExpr(col(vecCol), centroids).as("cell")) ++ codes: _*)
    val qDots = centroids.zipWithIndex.map { case (c, i) =>
      struct(Similarity.dotKernel(col("qv"), typedLit(c)).as("d"),
        lit(i).as("i"))
    }
    val probes = slice(reverse(array_sort(array(qDots: _*))), 1, nprobe)
    val luts = codebooks.zipWithIndex.map { case (cb, s) =>
      array(cb.map(c => Similarity.dotKernel(
        slice(col("qv"), s * sub + 1, sub), typedLit(c))): _*).as(s"lut$s")
    }
    val q = queries
      .select(Seq(col(idCol).as("qid"), col(vecCol).as("qv")) ++ luts: _*)
      .withColumn("probe_cells", transform(probes, p => p.getField("i")))
    val score = codebooks.indices
      .map(s => element_at(col(s"lut$s"), col(s"c$s") + 1)).reduce(_ + _)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("nid"))
    enc.join(broadcast(q),
        array_contains(col("probe_cells"), col("cell")) &&
          col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), score.as("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** DuckDB replay of [[ivfPqTopK]]: first-`nCells` IVF centroids and
    * first-`k` PQ codebooks recomputed from the table, identical cell
    * assignment (dot DESC, first index wins), identical probe routing
    * (dot DESC, LAST index wins ties — Spark's reversed struct sort),
    * identical LUT-sum scores. */
  def ivfPqOracleSql(table: String, dim: Int, m: Int, k: Int, nCells: Int,
      nprobe: Int, nQueries: Int, topK: Int): String = {
    val sub = dim / m
    val cols = (0 until m).map(s => s"c$s").mkString(", ")
    val encJoins = (1 until m).map(s => s"JOIN e$s USING (vec_id)").mkString(" ")
    val lutTerms = (0 until m).map { s =>
      s"list_dot_product(q.v[${s * sub + 1}:${(s + 1) * sub}], cb$s.c)"
    }
    val lutJoins = (0 until m).map(s => s"JOIN cb$s ON cb$s.code = e.c$s")
      .mkString(" ")
    s"""WITH ${encodeCtes(table, dim, m, k)},
       |enc AS (SELECT vec_id, $cols FROM e0 $encJoins),
       |cent AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, v
       |         FROM (SELECT * FROM t ORDER BY vec_id LIMIT $nCells)),
       |cells AS (SELECT vec_id, cell FROM (
       |  SELECT t.vec_id, c.cell,
       |    row_number() OVER (PARTITION BY t.vec_id
       |      ORDER BY list_dot_product(t.v, c.v) DESC, c.cell) AS rn
       |  FROM t CROSS JOIN cent c) WHERE rn = 1),
       |q AS (SELECT vec_id AS qid, v FROM t WHERE vec_id < $nQueries),
       |probes AS (SELECT qid, cell FROM (
       |  SELECT q.qid, c.cell,
       |    row_number() OVER (PARTITION BY q.qid
       |      ORDER BY list_dot_product(q.v, c.v) DESC, c.cell DESC) AS rn
       |  FROM q CROSS JOIN cent c) WHERE rn <= $nprobe),
       |scored AS (
       |  SELECT q.qid, e.vec_id AS nid,
       |    ${lutTerms.mkString(" + ")} AS score
       |  FROM q JOIN probes p ON p.qid = q.qid
       |  JOIN cells ON cells.cell = p.cell
       |  JOIN enc e ON e.vec_id = cells.vec_id AND e.vec_id <> q.qid
       |  $lutJoins)
       |SELECT qid, nid, score, rank FROM (
       |  SELECT qid, nid, score, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid) AS INT) AS rank FROM scored)
       |WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }

  /** DuckDB replay of [[pqEncode]] over [[pqCodebooksFrom]] codebooks:
    * first-k slices, the same augmented-dot score (identical operation
    * order: an 8-term sequential dot then one subtraction matches the
    * kernel's 9-term sequential dot whose last term is 1·(−b)), the same
    * first-index tie-break. */
  private def encodeCtes(table: String, dim: Int, m: Int, k: Int): String = {
    val sub = dim / m
    val cbs = (0 until m).map { s =>
      s"""cb$s AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS code,
         |  v[${s * sub + 1}:${(s + 1) * sub}] AS c
         |  FROM t ORDER BY vec_id LIMIT $k)""".stripMargin
    }
    val picks = (0 until m).map { s =>
      s"""e$s AS (SELECT vec_id, code AS c$s FROM (
         |  SELECT t.vec_id, cb$s.code,
         |    row_number() OVER (PARTITION BY t.vec_id
         |      ORDER BY list_dot_product(t.v[${s * sub + 1}:${(s + 1) * sub}], cb$s.c)
         |               - list_dot_product(cb$s.c, cb$s.c) / 2.0 DESC,
         |             cb$s.code) AS rn
         |  FROM t CROSS JOIN cb$s) WHERE rn = 1)""".stripMargin
    }
    (Seq(s"t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $table)") ++
      cbs ++ picks).mkString(",\n")
  }

  def pqEncodeOracleSql(table: String, dim: Int, m: Int, k: Int): String = {
    val joins = (1 until m).map(s => s"JOIN e$s USING (vec_id)").mkString(" ")
    val cols = (0 until m).map(s => s"c$s").mkString(", ")
    s"""WITH ${encodeCtes(table, dim, m, k)}
       |SELECT vec_id, $cols FROM e0 $joins ORDER BY vec_id""".stripMargin
  }

  /** DuckDB replay of [[pqAdcTopK]] over first-k codebooks: the LUT
    * entries are the same per-subspace dots and the score sums them in
    * the same left-to-right order. */
  def pqAdcOracleSql(table: String, dim: Int, m: Int, k: Int, nQueries: Int,
      topK: Int): String = {
    val sub = dim / m
    val cols = (0 until m).map(s => s"c$s").mkString(", ")
    val encJoins = (1 until m).map(s => s"JOIN e$s USING (vec_id)").mkString(" ")
    val lutTerms = (0 until m).map { s =>
      s"list_dot_product(q.v[${s * sub + 1}:${(s + 1) * sub}], cb$s.c)"
    }
    val lutJoins = (0 until m).map(s => s"JOIN cb$s ON cb$s.code = e.c$s")
      .mkString(" ")
    s"""WITH ${encodeCtes(table, dim, m, k)},
       |enc AS (SELECT vec_id, $cols FROM e0 $encJoins),
       |q AS (SELECT vec_id AS qid, v FROM t WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q.qid, e.vec_id AS nid,
       |    ${lutTerms.mkString(" + ")} AS score
       |  FROM q JOIN enc e ON e.vec_id <> q.qid $lutJoins)
       |SELECT qid, nid, score, rank FROM (
       |  SELECT qid, nid, score, CAST(row_number() OVER (PARTITION BY qid
       |    ORDER BY score DESC, nid) AS INT) AS rank FROM scored)
       |WHERE rank <= $topK
       |ORDER BY qid, rank""".stripMargin
  }
}
