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
    * oracle recomputes them from the table itself. Accepts float OR
    * double vector columns (the widening cast is exact), so rotated
    * `array<double>` outputs of [[opqBlockRotate]]/[[Pca.project]] feed
    * straight back in. */
  def pqCodebooksFrom(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, k: Int): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val firstK = df.orderBy(col(idCol)).limit(k)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toSeq).toSeq
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
    * first-index tie-break. `tCtes` overrides the corpus CTE chain — it
    * must end in a relation `t(vec_id, v DOUBLE[])` (the OPQ oracle
    * substitutes the ROTATED corpus here). */
  private def encodeCtes(table: String, dim: Int, m: Int, k: Int,
      tCtes: Option[String] = None): String = {
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
    (Seq(tCtes.getOrElse(
      s"t AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM $table)")) ++
      cbs ++ picks).mkString(",\n")
  }

  // ------------------------------------------------------------------
  // OPQ — Optimized Product Quantization (Ge et al., "Optimized Product
  // Quantization for Approximate Nearest Neighbor Search", CVPR 2013).
  // Plain PQ quantizes FIXED coordinate slices; when variance is spread
  // unevenly or correlated across slices, codebook bits are wasted. The
  // parametric solution (§4): rotate the space by the data's PCA
  // eigenbasis, then ALLOCATE principal directions to the M subspaces
  // balancing per-subspace eigenvalue products, and run PQ in the
  // rotated space. The rotation is a trained, shippable parameter —
  // encode stays one projection; at 100 TB nothing about the PQ plan
  // shape changes (the rotation rides the scan as literal coefficients).
  // ------------------------------------------------------------------

  /** Parametric OPQ rotation: (mean, R) where R's rows are the PCA
    * eigenbasis ([[Pca.fit]] — integer-exact Gram, driver Jacobi)
    * permuted by GREEDY EIGENVALUE ALLOCATION: directions in λ-descending
    * order each go to the non-full subspace with the smallest current
    * log-eigenvalue product (Ge et al. §4.2 — balances per-subspace
    * information so every codebook's k centroids carry similar load).
    * Rotate with [[Pca.project]]; encode the projection with
    * [[pqCodebooksFrom]]/[[pqTrain]] + [[pqEncode]] as usual. */
  def opqRotation(df: DataFrame, vecCol: String, dim: Int, m: Int,
      quantBits: Int = 10): (Array[Double], Array[Array[Double]]) = {
    require(dim % m == 0, "m must divide dim")
    val sub = dim / m
    val (mean, comps, vals) = Pca.fit(df, vecCol, dim, dim, quantBits)
    val buckets = Array.fill(m)(List.empty[Int])
    val logProd = Array.fill(m)(0.0)
    (0 until dim).foreach { i => // vals already λ-descending
      // LAYERED greedy: among non-full buckets, fill the least-loaded
      // layer first, ties by smallest accumulated log-product. Plain
      // smallest-product greedy is degenerate when eigenvalues sit
      // below 1 (normalized data): multiplying by λ < 1 only shrinks a
      // bucket's product, so the strongest directions would all pile
      // into ONE subspace — the exact imbalance allocation exists to
      // prevent. Layering assigns each bucket one direction per round,
      // weakest-so-far bucket first, balancing products at any λ scale.
      val open = (0 until m).filter(b => buckets(b).size < sub)
      val minLoad = open.map(buckets(_).size).min
      val tgt = open.filter(buckets(_).size == minLoad)
        .minBy(b => (logProd(b), b))
      buckets(tgt) = buckets(tgt) :+ i
      logProd(tgt) += math.log(math.max(vals(i), 1e-300))
    }
    (mean, buckets.flatten.map(comps).toArray)
  }

  /** Exactly-replayable OPQ twin for the cross-engine probe: per
    * CONSECUTIVE DIMENSION PAIR (2p, 2p+1), the closed-form 2×2 Jacobi
    * rotation that diagonalizes that covariance block — one cyclic-
    * Jacobi sweep restricted to disjoint pairs, i.e. a block-diagonal
    * constrained R (the full [[opqRotation]] is the quality path; its
    * driver eigensolve has no SQL replay). Every quantity here is a
    * fixed sequence of correctly-rounded IEEE ops over the INTEGER Gram
    * (bit-identical cross-engine, [[Pca.gramTable]]), so the DuckDB
    * oracle reproduces c/s — and therefore codes — exactly: θ =
    * (g_jj − g_ii) / (2·g_ij), t = sgn(θ)/(|θ| + √(θ²+1)), c = 1/√(t²+1),
    * s = t·c; g_ij = 0 (integer test) → identity. Returns the (c, s)
    * pair per block. */
  def opqBlockRotation(df: DataFrame, vecCol: String, dim: Int,
      quantBits: Int = 10): Seq[(Double, Double)] = {
    require(dim % 2 == 0, "block rotation needs an even dim")
    // only the 3 cells per pair are needed — Pca.gramCells computes
    // exactly those in ONE explode-free aggregate (the full dim² table
    // spent ~dim/3 of its dominant stage on unused cells), bit-identical
    // values, so the full-Gram oracle still matches
    val wanted = (0 until dim / 2).flatMap { p =>
      val (i, j) = (2 * p, 2 * p + 1)
      Seq((i, i), (j, j), (i, j))
    }
    val g = Pca.gramCells(df, vecCol, quantBits, wanted)
    (0 until dim / 2).map { p =>
      val (i, j) = (2 * p, 2 * p + 1)
      val gij = g((i, j))
      if (gij == 0L) (1.0, 0.0)
      else {
        val theta = (g((j, j)).toDouble - g((i, i)).toDouble) /
          (2.0 * gij.toDouble)
        val t = (if (theta >= 0.0) 1.0 else -1.0) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(t * t + 1.0)
        (c, t * c)
      }
    }
  }

  /** Apply [[opqBlockRotation]] as a shuffle-free projection:
    * (idCol, proj array<double>) with x′₂ₚ = c·x₂ₚ − s·x₂ₚ₊₁ and
    * x′₂ₚ₊₁ = s·x₂ₚ + c·x₂ₚ₊₁ — literal coefficients inside the scan
    * stage, the [[Pca.project]] shape. */
  def opqBlockRotate(df: DataFrame, idCol: String, vecCol: String,
      cs: Seq[(Double, Double)]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val outs = cs.zipWithIndex.flatMap { case ((c, s), p) =>
      val (xi, xj) = (element_at(v, 2 * p + 1), element_at(v, 2 * p + 2))
      Seq(lit(c) * xi - lit(s) * xj, lit(s) * xi + lit(c) * xj)
    }
    df.select(col(idCol), array(outs: _*).as("proj"))
  }

  /** DuckDB replay of block-OPQ encode: integer Gram → closed-form c/s
    * per pair (same op order as [[opqBlockRotation]]) → rotated corpus →
    * first-k codebooks → augmented-argmin codes. */
  def opqBlockOracleSql(table: String, dim: Int, m: Int, k: Int,
      quantBits: Int = 10): String = {
    val cols = (0 until m).map(s => s"c$s").mkString(", ")
    val joins = (1 until m).map(s => s"JOIN e$s USING (vec_id)").mkString(" ")
    val tCtes =
      Pca.gramCtes(table, "embedding", dim, quantBits) + ",\n" +
        s"""gd AS (SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
           |    CAST(mi.n * s.s - mi.m * mj.m AS BIGINT) AS g
           |  FROM s JOIN m mi ON s.i = mi.k JOIN m mj ON s.j = mj.k
           |  WHERE s.j - s.i <= 1 AND s.j >= s.i
           |    AND (s.i % 2 = 0 OR s.i = s.j)),
           |pairsrc AS (SELECT CAST(i // 2 AS INT) AS p,
           |    MAX(CASE WHEN i = j AND i % 2 = 0 THEN g END) AS gii,
           |    MAX(CASE WHEN i = j AND i % 2 = 1 THEN g END) AS gjj,
           |    MAX(CASE WHEN i + 1 = j THEN g END) AS gij
           |  FROM gd WHERE j // 2 = i // 2 GROUP BY 1),
           |rth AS (SELECT p, (CAST(gjj AS DOUBLE) - CAST(gii AS DOUBLE))
           |      / (2.0 * CAST(gij AS DOUBLE)) AS theta
           |  FROM pairsrc WHERE gij <> 0),
           |rts AS (SELECT p, (CASE WHEN theta >= 0.0 THEN 1.0 ELSE -1.0 END)
           |      / (abs(theta) + sqrt(theta * theta + 1.0)) AS t
           |  FROM rth),
           |rot AS (SELECT p, 1.0 / sqrt(t * t + 1.0) AS c,
           |    t * (1.0 / sqrt(t * t + 1.0)) AS s FROM rts
           |  UNION ALL
           |  SELECT p, 1.0 AS c, 0.0 AS s FROM pairsrc WHERE gij = 0),
           |carr AS (SELECT list(c ORDER BY p) AS cs, list(s ORDER BY p) AS ss
           |  FROM rot),
           |t0 AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM $table),
           |t AS (SELECT vec_id, flatten(
           |    [[cs[CAST(p AS INT) + 1] * v0[2 * CAST(p AS INT) + 1]
           |        - ss[CAST(p AS INT) + 1] * v0[2 * CAST(p AS INT) + 2],
           |      ss[CAST(p AS INT) + 1] * v0[2 * CAST(p AS INT) + 1]
           |        + cs[CAST(p AS INT) + 1] * v0[2 * CAST(p AS INT) + 2]]
           |     for p in range(0, ${dim / 2})]) AS v
           |  FROM t0, carr)""".stripMargin
    s"""WITH ${encodeCtes(table, dim, m, k, Some(tCtes))}
       |SELECT vec_id, $cols FROM e0 $joins ORDER BY vec_id""".stripMargin
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
