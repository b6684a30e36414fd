package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained PCA over an embedding column — the learned counterpart of
  * [[RandomProjection]] (whitening / decorrelation before SemDeDup-style
  * clustering, PQ codebooks, or cosine LSH; the reference has no vector
  * surface at all, lib.rs:678).
  *
  * Fit is split the only way that is EXACT at scale: the distributed
  * pass accumulates integer statistics (quantized component sums m and
  * the second-moment outer products S), and the covariance-shaped Gram
  * `G = n·S − m·mᵀ` is assembled from them — integer arithmetic is
  * associative, so G is bit-identical under any partitioning and the
  * DuckDB oracle replays it exactly (floats would differ by reduction
  * order). The o(dim²) eigensolve (cyclic Jacobi) runs on the driver —
  * at 100 TB the data pass is the cost; a 64×64 eigensolve is free.
  *
  * Scale shape: the S pass explodes dim² products per row but they
  * map-side combine into dim² groups, so the shuffle carries
  * O(dim² · partitions) rows; the m pass is the same at O(dim). The
  * quantized-sum magnitudes bound exactness: sums are accumulated as
  * DECIMAL(38,0), exact past 10^37 — n·2^(2·quantBits+2·log2|x|)
  * stays far inside that for any realistic corpus (int64 would wrap at
  * ~10^6 rows already, which is why the accumulator is decimal).
  */
object Pca {

  /** Quantized components: floor(x·2^quantBits) — the
    * [[RandomProjection]] recipe (floor, not round: no cross-engine
    * tie-direction question). */
  private def quantExpr(vecCol: String, quantBits: Int): Column =
    expr(s"transform(cast($vecCol as array<double>), " +
      s"x -> cast(floor(x * ${1L << quantBits}) as bigint))")

  /** The flattened integer Gram table (i, j, g) with
    * g = n·S[i,j] − m[i]·m[j] — n² times the covariance of the
    * quantized vectors. Null vectors are skipped. */
  private val Dec = "decimal(38,0)"

  /** Quantized-vector relation feeding both moment passes. Spread to the
    * cluster's parallelism before the dim²-per-row explode ([[OpConf.
    * spreadForKernel]]): a compact embeddings parquet plans a handful of
    * scan splits (4 tasks at sf0.1) and the dominant outer-product stage
    * serializes on them — measured 2.9 s on 4 of 32 threads; the spread
    * shuffles only the quantized arrays (~0.5 KB/row) and the same stage
    * runs cluster-wide (0.45 s). A finely-split cluster table skips the
    * exchange entirely. [[sTable]] and [[mTable]] build the IDENTICAL
    * subplan, so the one exchange is reused across both passes at
    * runtime. Integer sums are order-independent — the spread cannot
    * move a bit in the output. */
  private def quantized(df: DataFrame, vecCol: String, quantBits: Int) =
    OpConf.spreadForKernel(df.where(col(vecCol).isNotNull)
      .select(quantExpr(vecCol, quantBits).as("q")))

  /** Second-moment table (pos = i·dim+j, s = Σ qᵢqⱼ) for the FULL
    * matrix. S is symmetric, so only the upper triangle is exploded and
    * aggregated (halving the dominant dim²-per-row stage); the lower
    * triangle is mirrored from the dim²-row AGGREGATE, which is free. */
  private def sTable(df: DataFrame, vecCol: String, quantBits: Int,
      dim: Int) = {
    val upper = quantized(df, vecCol, quantBits)
      .select(explode(expr(
        s"""flatten(transform(q, (x, i) ->
           |  transform(slice(q, i + 1, size(q) - i),
           |    (y, k) -> struct(i * $dim + i + k AS pos, x * y AS prod))))"""
          .stripMargin)).as("g"))
      .select(col("g.pos").as("pos"), col("g.prod").as("prod"))
      .groupBy("pos").agg(sum(col("prod").cast(Dec)).as("s"))
    val i = (col("pos") / dim).cast("int")
    val j = pmod(col("pos"), lit(dim)).cast("int")
    upper.union(upper.where(i =!= j)
      .select((j * dim + i).cast("int").as("pos"), col("s")))
  }

  /** Component-sum table (k, m = Σ qₖ, n). */
  private def mTable(df: DataFrame, vecCol: String, quantBits: Int) =
    quantized(df, vecCol, quantBits)
      .select(posexplode(col("q")).as(Seq("k", "qk")))
      .groupBy("k").agg(sum(col("qk").cast(Dec)).as("m"),
        count(lit(1)).as("n"))

  /** SELECTED Gram cells g(i,j) = n·S[i,j] − m[i]·m[j] as a driver map —
    * for consumers that need only O(dim) cells (the block-OPQ rotation
    * needs 3 per dimension pair), computing the full dim² table wastes
    * ~dim/3 of the dominant stage. This is ONE explode-free aggregate:
    * a sum expression per requested product plus the dim component sums
    * and the row count, all map-side combined — identical per-row
    * LONG products and DECIMAL(38,0) accumulation as [[gramTable]]
    * (integer sums are associative), so every returned cell is
    * bit-identical to the full table's. */
  def gramCells(df: DataFrame, vecCol: String, quantBits: Int,
      cells: Seq[(Int, Int)]): Map[(Int, Int), Long] = {
    val dims = cells.flatMap(c => Seq(c._1, c._2)).distinct.sorted
    // UNSPREAD, unlike [[quantized]] (r18): this aggregate does a few
    // products per row (|cells| + |dims|), not dim² — partial
    // aggregation over the scan's own splits already parallelizes the
    // cheap per-row work, and the round-robin exchange of quantized
    // arrays the S/m passes need would be pure overhead here (measured
    // in-suite on q_ann_opq, whose rotation step calls this per block:
    // 1.03 s → 1.27 s with the spread).
    val base = df.where(col(vecCol).isNotNull)
      .select(quantExpr(vecCol, quantBits).as("q"))
    val sAggs = cells.map { case (i, j) =>
      sum((element_at(col("q"), i + 1) * element_at(col("q"), j + 1))
        .cast(Dec)).as(s"s_${i}_$j")
    }
    val mAggs = dims.map(k =>
      sum(element_at(col("q"), k + 1).cast(Dec)).as(s"m_$k"))
    val aggs = sAggs ++ mAggs :+ count(lit(1)).as("n")
    val row = base.agg(aggs.head, aggs.tail: _*).collect()(0)
    val n = BigDecimal(row.getAs[Long]("n"))
    val m = dims.map(k => k -> BigDecimal(row.getAs[java.math.BigDecimal](s"m_$k"))).toMap
    cells.map { case (i, j) =>
      val s = BigDecimal(row.getAs[java.math.BigDecimal](s"s_${i}_$j"))
      (i, j) -> (n * s - m(i) * m(j)).toLong
    }.toMap
  }

  def gramTable(df: DataFrame, vecCol: String, dim: Int,
      quantBits: Int = 10): DataFrame = {
    val s = sTable(df, vecCol, quantBits, dim)
      .select((col("pos") / dim).cast("int").as("i"),
        pmod(col("pos"), lit(dim)).cast("int").as("j"), col("s"))
    val m = mTable(df, vecCol, quantBits)
    val mi = m.select(col("k").as("i"), col("m").as("mi"), col("n"))
    val mj = m.select(col("k").as("j"), col("m").as("mj"))
    s.join(mi, "i").join(mj, "j")
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        (col("n").cast(Dec) * col("s") - col("mi") * col("mj"))
          .cast("long").as("g"))
  }

  /** The [[gramOracleSql]] CTE chain without the final select — ends in
    * relations `s(i, j, s)` and `m(k, m, n)` so composing oracles (the
    * OPQ block rotation) can assemble G themselves. Concatenated, never
    * re-stripMargin'd (the '||'-continuation rule). */
  private[operators] def gramCtes(table: String, vecCol: String, dim: Int,
      quantBits: Int = 10): String = {
    val scale = 1L << quantBits
    s"""e AS (SELECT list_transform($vecCol::DOUBLE[],
       |    x -> CAST(floor(x * $scale.0) AS BIGINT)) AS q
       |  FROM $table WHERE $vecCol IS NOT NULL),
       |p AS (SELECT unnest(flatten([[{'pos': (i-1)*$dim + (j-1),
       |      'prod': q[CAST(i AS INT)] * q[CAST(j AS INT)]}
       |    for j in range(1, $dim + 1)] for i in range(1, $dim + 1)])) AS c
       |  FROM e),
       |s AS (SELECT c.pos // $dim AS i, c.pos % $dim AS j,
       |    sum(CAST(c.prod AS HUGEINT)) AS s
       |  FROM p GROUP BY 1, 2),
       |m AS (SELECT (k-1) AS k, sum(CAST(q[CAST(k AS INT)] AS HUGEINT)) AS m,
       |    CAST(count(*) AS HUGEINT) AS n
       |  FROM e CROSS JOIN range(1, $dim + 1) t(k) GROUP BY 1)""".stripMargin
  }

  /** DuckDB replay of [[gramTable]] — nested comprehension outer
    * products, HUGEINT-exact sums, same n·S − m·mᵀ assembly. */
  def gramOracleSql(table: String, vecCol: String, dim: Int,
      quantBits: Int = 10): String =
    "WITH " + gramCtes(table, vecCol, dim, quantBits) + "\n" +
      s"""SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
         |  CAST(mi.n * s.s - mi.m * mj.m AS BIGINT) AS g
         |FROM s JOIN m mi ON s.i = mi.k JOIN m mj ON s.j = mj.k
         |ORDER BY i, j""".stripMargin

  /** Cyclic Jacobi eigensolve of a symmetric matrix: (eigenvalues,
    * eigenvectors as rows), sorted by eigenvalue descending. Plain
    * deterministic O(dim³) driver code — dim is 64 here, the data pass
    * is the distributed part. */
  private[graft] def jacobiEigen(g: Array[Array[Double]],
      sweeps: Int = 50): (Array[Double], Array[Array[Double]]) = {
    val n = g.length
    val a = g.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-20) {
      off = 0.0
      for (p <- 0 until n; q <- (p + 1) until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-300) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // sgn(0) must act as +1 (Numerical Recipes' form): equal
          // diagonal entries (theta = 0) still need a 45° rotation —
          // math.signum(0) = 0 would silently skip it forever
          val t = (if (theta >= 0.0) 1.0 else -1.0) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => (0 until n).map(k => v(k)(i)).toArray).toArray)
  }

  /** (mean, components, eigenvalues): top-`d` principal axes. The mean
    * is in ORIGINAL units; components are orthonormal rows; eigenvalues
    * are in original variance units. */
  def fit(df: DataFrame, vecCol: String, dim: Int, d: Int,
      quantBits: Int = 10): (Array[Double], Array[Array[Double]], Array[Double]) = {
    val scale = (1L << quantBits).toDouble
    // exactly TWO data passes (S and m); G = n·S − m·mᵀ is assembled on
    // the driver from the dim² + dim collected statistics — the
    // distributed join in gramTable exists for the oracle probe's flat
    // output, not for fit
    val sRows = sTable(df, vecCol, quantBits, dim).collect()
      .map(r => r.getInt(0) -> BigDecimal(r.getDecimal(1))).toMap
    val mRows = mTable(df, vecCol, quantBits).collect()
      .map(r => r.getInt(0) -> ((BigDecimal(r.getDecimal(1)), r.getLong(2))))
      .toMap
    val n = mRows(0)._2.toDouble
    val mean = (0 until dim).map(k =>
      (mRows(k)._1 / n).toDouble / scale).toArray
    // G is n² · scale² · covariance — rescale for eigenvalues in
    // variance units (eigenvectors are scale-invariant)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val g = BigDecimal(n.toLong) * sRows(i * dim + j) -
        mRows(i)._1 * mRows(j)._1
      g.toDouble / (n * n * scale * scale)
    }
    val (vals, vecs) = jacobiEigen(cov)
    (mean, vecs.take(d), vals.take(d))
  }

  /** Shuffle-free projection y = V·(x − mean): each output coordinate is
    * a literal-coefficient linear form inside the scan stage (the
    * [[RandomProjection]] shape — constants ship with the plan, no
    * join). Output (idCol, proj array<double>). */
  def project(df: DataFrame, idCol: String, vecCol: String,
      mean: Array[Double], components: Array[Array[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val outs = components.map { comp =>
      val shift = comp.indices.map(i => comp(i) * mean(i)).sum
      comp.indices.map(i =>
          element_at(v, i + 1) * lit(comp(i)))
        .reduce(_ + _) - lit(shift)
    }
    df.select(col(idCol), array(outs.toIndexedSeq: _*).as("proj"))
  }
}
