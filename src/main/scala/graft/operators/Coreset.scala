package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Greedy k-center coreset selection over an embedding column — the
  * farthest-point-first construction (Gonzalez '85; the "k-Center-Greedy"
  * of Sener & Savarese's active-learning coreset paper, ICLR '18) that a
  * curation pipeline uses to pick a small DIVERSE subset of a corpus:
  * each step adds the point farthest from everything already selected,
  * giving a 2-approximation of the optimal k-center cover. SemDeDup
  * ([[Similarity.semDedup]]) removes redundancy; this is its dual —
  * pick the spanning exemplars. (Beyond-ref extension: the reference's
  * DataFusion surface at lib.rs:678 has no vector operators.)
  *
  * EXACTNESS: embeddings are quantized ONCE to integers
  * (`floor(x·scale)` per dimension) and all distances are integer
  * squared-L2 — sums of BIGINT products are order-independent and
  * bit-exact under any partitioning, so every argmax (ties broken by
  * min id) is deterministic and the whole greedy trajectory replays in
  * DuckDB as an unrolled CTE chain (the [[PageRank]] recipe; floating
  * distances could never hash-match the selection cross-engine). Each
  * [[Center]] carries the scale it was quantized at, so a later
  * [[assign]] can never silently mix units.
  *
  * Scale shape: the RUNNING MINIMUM distance is a persisted column —
  * iteration t is one shuffle-free job over the persisted
  * (id, q, mind) generation: a top-1 TakeOrdered argmax, then a
  * projection folding in ONLY the newest center's distance
  * (`least(mind, dist)`), persisted as generation t+1; generation t-1
  * unpersists once t is materialized. Total O(k·n·dim) work (NOT
  * k²·n·dim — distances to old centers are never recomputed), O(k)
  * driver rows collected — the canonical distributed farthest-point
  * sweep. Final assignment is one projection (argmin over the k
  * literal centers), no join, no shuffle.
  */
object Coreset {

  /** `floor(x·scale)` per dimension as BIGINT — the shared deterministic
    * quantizer (scale a power of two keeps the product exact for
    * |x| ≤ ~2^40/scale, far beyond unit-norm embeddings). */
  def quantize(vec: Column, scale: Int): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  private def sqDistToLit(q: Column, center: Seq[Long]): Column = {
    val c = array(center.map(lit): _*)
    aggregate(zip_with(q, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, v) => acc + v)
  }

  /** One selected center: 1-based selection order, its id, quantized
    * vector (at `scale`), and `radius_q` = its squared distance to the
    * previously selected set at selection time (the coverage radius
    * sequence, monotonically non-increasing; -1 for the seed). */
  final case class Center(iter: Int, id: Long, vec: Seq[Long],
      radiusQ: Long, scale: Int)

  /** Run the greedy sweep: seed = min id (deterministic), then up to
    * k-1 farthest-point steps (ties by min id). STOPS EARLY when the
    * farthest remaining point is at distance 0 — every vector is
    * already a selected center (k exceeds the distinct-vector count),
    * so continuing would only emit duplicate centers. Collects O(k)
    * rows. */
  def kCenterGreedy(df: DataFrame, idCol: String, vecCol: String, k: Int,
      scale: Int = 1024): Seq[Center] = {
    require(k >= 1, "k-center needs k >= 1")
    val q = df.select(col(idCol).cast("long").as("id"),
        quantize(col(vecCol), scale).as("q"))
      .transform(OperatorCache.persist)
    val seedRow = q.orderBy("id").limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("k-center on an empty corpus"))
    val seed = Center(1, seedRow.getLong(0), seedRow.getSeq[Long](1),
      -1L, scale)
    var centers = Vector(seed)
    if (k == 1) { q.unpersist(); return centers }
    // generation 0 of the running minimum: distance to the seed
    var cur = q.select(col("id"), col("q"),
        sqDistToLit(col("q"), seed.vec).as("mind"))
      .transform(OperatorCache.persist)
    var prev: DataFrame = null
    var t = 2
    var exhausted = false
    while (t <= k && !exhausted) {
      // the argmax action materializes `cur`, so the PREVIOUS
      // generation's blocks are safe to drop now
      val next = cur.orderBy(col("mind").desc, col("id")).limit(1)
        .collect()(0)
      if (prev != null) prev.unpersist()
      if (next.getLong(2) == 0L) exhausted = true
      else {
        val c = Center(t, next.getLong(0), next.getSeq[Long](1),
          next.getLong(2), scale)
        centers :+= c
        prev = cur
        cur = cur.select(col("id"), col("q"),
            least(col("mind"), sqDistToLit(col("q"), c.vec)).as("mind"))
          .transform(OperatorCache.persist)
        t += 1
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    q.unpersist()
    centers
  }

  /** Assign every point to its nearest selected center (ties by earliest
    * center): (id, center_id, center_iter, dist_q). Shuffle-free — the
    * argmin folds over the k centers as literals inside one projection.
    * The quantization scale comes FROM the centers (recorded at
    * selection), so assignment can never compare mixed units. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      centers: Seq[Center]): DataFrame = {
    require(centers.nonEmpty, "assign needs at least one center")
    val scales = centers.map(_.scale).distinct
    require(scales.size == 1,
      s"centers quantized at mixed scales: $scales")
    val q = quantize(col(vecCol), scales.head)
    val candidates = array(centers.map { c =>
      struct(sqDistToLit(q, c.vec).as("dist_q"),
        lit(c.iter).cast("long").as("center_iter"),
        lit(c.id).as("center_id"))
    }: _*)
    df.select(col(idCol).cast("long").as("id"),
        array_min(candidates).as("best"))
      .select(col("id"), col("best.center_id").as("center_id"),
        col("best.center_iter").as("center_iter"),
        col("best.dist_q").as("dist_q"))
  }

  /** DuckDB replay of [[kCenterGreedy]] + [[assign]]: the identical
    * integer quantization, unrolled per-iteration running-min argmax
    * CTEs, and the final per-point argmin. `table` must expose
    * (id, vec) columns named by the caller's SELECT; `dim` is the
    * embedding width. (The unrolled chain assumes k ≤ the
    * distinct-vector count — at the probe's k the corpus never
    * exhausts, and the early-stop path is spec-covered.) */
  def oracleSql(table: String, idCol: String, vecCol: String, k: Int,
      dim: Int, scale: Int = 1024): String = {
    def d(a: String, b: String) =
      s"""CAST(list_sum(list_transform(range($dim), i ->
         |    ($a[CAST(i AS INT)+1] - $b[CAST(i AS INT)+1]) *
         |    ($a[CAST(i AS INT)+1] - $b[CAST(i AS INT)+1])))
         |  AS BIGINT)""".stripMargin
    val steps = (2 to k).map { t =>
      val upd =
        if (t == 2)
          s"""d1 AS (SELECT e.id, e.q, ${d("e.q", "c.q")} AS mind
             |  FROM e, c1 c)""".stripMargin
        else
          s"""d${t - 1} AS (SELECT d.id, d.q,
             |    least(d.mind, ${d("d.q", "c.q")}) AS mind
             |  FROM d${t - 2} d, c${t - 1} c)""".stripMargin
      s"""$upd,
         |c$t AS (SELECT id, q FROM d${t - 1}
         |  ORDER BY mind DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val cen = (1 to k).map(t => s"SELECT $t AS iter, id, q FROM c$t")
      .mkString(" UNION ALL ")
    s"""WITH e AS (SELECT CAST($idCol AS BIGINT) AS id,
       |    list_transform($vecCol::DOUBLE[], x ->
       |      CAST(floor(x * $scale) AS BIGINT)) AS q
       |  FROM $table),
       |c1 AS (SELECT id, q FROM e ORDER BY id LIMIT 1),
       |$steps,
       |cen AS ($cen),
       |ad AS (SELECT e.id, cen.id AS center_id,
       |    CAST(cen.iter AS BIGINT) AS center_iter,
       |    ${d("e.q", "cen.q")} AS dist_q
       |  FROM e, cen),
       |r AS (SELECT *, row_number() OVER (PARTITION BY id
       |    ORDER BY dist_q, center_iter) AS rn FROM ad)
       |SELECT id, center_id, center_iter, dist_q FROM r WHERE rn = 1
       |ORDER BY id""".stripMargin
  }
}
