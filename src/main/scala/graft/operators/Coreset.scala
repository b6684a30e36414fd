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

  // --- DuckDB replay fragments, ONE copy each (the
  // Sampling.duckMd5Bucket convention: these recipes are
  // exactness-critical, and a drift between hand-mirrored copies
  // surfaces as oracle mismatches that look like operator bugs) ------

  /** DuckDB replay of [[quantize]] over SQL expression `vecExpr`. */
  private[operators] def duckQuantize(vecExpr: String, scale: Int): String =
    s"list_transform($vecExpr::DOUBLE[], x -> " +
      s"CAST(floor(x * $scale) AS BIGINT))"

  /** DuckDB integer squared-L2 between two quantized list exprs. */
  private[operators] def duckSqDistL2(a: String, b: String,
      dim: Int): String =
    s"""CAST(list_sum(list_transform(range($dim), i ->
       |    ($a[CAST(i AS INT)+1] - $b[CAST(i AS INT)+1]) *
       |    ($a[CAST(i AS INT)+1] - $b[CAST(i AS INT)+1])))
       |  AS BIGINT)""".stripMargin

  /** DuckDB integer dot product between two quantized list exprs. */
  private[operators] def duckDot(a: String, b: String, dim: Int): String =
    s"""CAST(list_sum(list_transform(range($dim), i ->
       |    $a[CAST(i AS INT)+1] * $b[CAST(i AS INT)+1]))
       |  AS BIGINT)""".stripMargin

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

  /** One per-bucket center from [[kCenterSharded]]'s local phase. */
  final case class ShardCenter(bucket: Long, iter: Int, id: Long,
      vec: Seq[Long], radiusQ: Long, scale: Int)

  private def sqLocal(a: Seq[Long], b: Seq[Long]): Long =
    a.iterator.zip(b.iterator).map { case (x, y) => (x - y) * (x - y) }.sum

  /** Pure-Scala greedy with [[kCenterGreedy]]'s exact semantics (seed =
    * min id, argmax ties by min id, early stop at distance 0) — the
    * merge step of [[kCenterSharded]] runs it over the O(buckets·k)
    * collected bucket centers. */
  private[operators] def greedyLocal(points: Seq[(Long, Seq[Long])],
      k: Int, scale: Int): Seq[Center] = {
    require(points.nonEmpty, "k-center merge on an empty center set")
    val seed = points.minBy(_._1)
    var centers = Vector(Center(1, seed._1, seed._2, -1L, scale))
    var mind = points.map { case (id, v) => (id, v, sqLocal(v, seed._2)) }
    var t = 2
    var stop = false
    while (t <= k && !stop) {
      val cands = mind.filter(_._3 > 0)
      if (cands.isEmpty) stop = true
      else {
        val win = cands.minBy { case (id, _, d) => (-d, id) }
        centers :+= Center(t, win._1, win._2, win._3, scale)
        mind = mind.map { case (id, v, d) =>
          (id, v, math.min(d, sqLocal(v, win._2)))
        }
        t += 1
      }
    }
    centers
  }

  /** Merge-and-reduce k-center — the composition that scales the greedy
    * sweep past [[kCenterGreedy]]'s k sequential corpus passes: deal
    * points into `numBuckets` DETERMINISTIC md5 buckets (semantic, not
    * physical partitions — so the whole construction is replayable and
    * partition-invariant), run ALL buckets' greedy sweeps
    * simultaneously (each iteration is ONE distributed job: a
    * per-bucket bounded-heap argmax + a projection folding in each
    * bucket's newest center), then run the same greedy over the
    * O(numBuckets·kPerBucket) collected bucket centers on the driver —
    * the classic coreset merge step (Har-Peled & Mazumdar '04 shape).
    * A 2-approximation of a 2-approximation: bounded quality loss for
    * a kPerBucket-pass (not kFinal·numBuckets-pass) schedule, and the
    * same shape works as a streaming accumulate-then-merge.
    *
    * EXACTNESS: same integer quantization/distances as
    * [[kCenterGreedy]]; bucket = md5-hex8(id) mod numBuckets (the
    * [[Sampling]] recipe); every per-bucket argmax breaks ties by min
    * id; exhausted buckets (farthest remaining point at distance 0)
    * stop adding centers. Both phases and the final assignment replay
    * in DuckDB ([[shardedOracleSql]]).
    *
    * Returns (per-bucket centers, merged final centers). Assign points
    * with [[assign]] over the final centers. */
  def kCenterSharded(df: DataFrame, idCol: String, vecCol: String,
      numBuckets: Int, kPerBucket: Int, kFinal: Int,
      scale: Int = 1024): (Seq[ShardCenter], Seq[Center]) = {
    require(numBuckets >= 1 && kPerBucket >= 1 && kFinal >= 1,
      "sharded k-center needs positive numBuckets/kPerBucket/kFinal")
    val bucket = Sampling.md5Bucket(col(idCol), numBuckets)
    val q = df.select(col(idCol).cast("long").as("id"),
        bucket.as("bucket"), quantize(col(vecCol), scale).as("q"))
      .transform(OperatorCache.persist)
    // per-bucket seeds: min id (one bounded-heap pass for all buckets)
    val seedRows = graft.plans.TopK.perKey(q, Seq("bucket"),
        Seq(("id", true)), k = 1)
      .select(col("bucket"), col("id"), col("q")).collect()
    require(seedRows.nonEmpty, "sharded k-center on an empty corpus")
    var perBucket = seedRows.toVector.map(r =>
      ShardCenter(r.getLong(0), 1, r.getLong(1), r.getSeq[Long](2),
        -1L, scale))
    val seeds = perBucket.map(c => c.bucket -> c).toMap
    var cur = q.withColumn("mind",
        seeds.foldLeft(lit(Long.MaxValue)) { case (acc, (b, c)) =>
          when(col("bucket") === b, sqDistToLit(col("q"), c.vec))
            .otherwise(acc)
        })
      .transform(OperatorCache.persist)
    var prev: DataFrame = null
    var t = 2
    var active = kPerBucket >= 2
    while (t <= kPerBucket && active) {
      // one bounded-heap argmax per bucket, all buckets in one job; a
      // bucket whose max mind is 0 has every point on a center already
      val tops = graft.plans.TopK.perKey(cur, Seq("bucket"),
          Seq(("mind", false), ("id", true)), k = 1)
        .filter(col("mind") > 0)
        .select(col("bucket"), col("id"), col("q"), col("mind")).collect()
      if (prev != null) prev.unpersist()
      if (tops.isEmpty) active = false
      else {
        val newCs = tops.toVector.map(r =>
          ShardCenter(r.getLong(0), t, r.getLong(1), r.getSeq[Long](2),
            r.getLong(3), scale))
        perBucket ++= newCs
        prev = cur
        cur = cur.withColumn("mind",
            newCs.foldLeft(col("mind")) { case (acc, c) =>
              when(col("bucket") === c.bucket,
                least(col("mind"), sqDistToLit(col("q"), c.vec)))
                .otherwise(acc)
            })
          .transform(OperatorCache.persist)
        t += 1
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    q.unpersist()
    val merged = greedyLocal(
      perBucket.map(c => c.id -> c.vec).sortBy(_._1), kFinal, scale)
    (perBucket, merged)
  }

  /** DuckDB replay of [[kCenterSharded]] + [[assign]]: md5 bucket deal,
    * per-bucket simultaneous greedy (QUALIFY per-bucket argmax, LEFT
    * JOIN so exhausted buckets keep their running min), driver merge
    * greedy unrolled over the bucket-center union, final per-point
    * argmin. Output (id, center_id, center_iter, dist_q) ORDER BY id. */
  def shardedOracleSql(table: String, idCol: String, vecCol: String,
      numBuckets: Int, kPerBucket: Int, kFinal: Int, dim: Int,
      scale: Int = 1024): String = {
    def d(a: String, b: String) = duckSqDistL2(a, b, dim)
    // phase 1: per-bucket simultaneous greedy, unrolled
    val localSteps = (2 to kPerBucket).map { t =>
      val prevD = if (t == 2) "d1" else s"d${t - 1}"
      val mkD =
        if (t == 2)
          s"""d1 AS (SELECT e.id, e.bucket, e.q, ${d("e.q", "s.q")} AS mind
             |  FROM e JOIN s ON e.bucket = s.bucket)""".stripMargin
        else ""
      val c =
        s"""c$t AS (SELECT bucket, id, q, mind FROM $prevD WHERE mind > 0
           |  QUALIFY row_number() OVER (PARTITION BY bucket
           |    ORDER BY mind DESC, id) = 1)""".stripMargin
      val nextD =
        if (t < kPerBucket)
          s""",
             |d$t AS (SELECT p.id, p.bucket, p.q,
             |    CASE WHEN c.id IS NOT NULL
             |      THEN least(p.mind, ${d("p.q", "c.q")})
             |      ELSE p.mind END AS mind
             |  FROM $prevD p LEFT JOIN c$t c ON p.bucket = c.bucket)"""
            .stripMargin
        else ""
      (if (mkD.nonEmpty) mkD + ",\n" else "") + c + nextD
    }.mkString(",\n")
    val cenUnion = ("SELECT id, q FROM s" +:
      (2 to kPerBucket).map(t => s"SELECT id, q FROM c$t"))
      .mkString(" UNION ALL ")
    // phase 2: merge greedy over the bucket centers, unrolled
    val mergeSteps = (2 to kFinal).map { t =>
      val upd =
        if (t == 2)
          s"""g1 AS (SELECT cen.id, cen.q, ${d("cen.q", "f.q")} AS mind
             |  FROM cen, f1 f)""".stripMargin
        else
          s"""g${t - 1} AS (SELECT g.id, g.q,
             |    least(g.mind, ${d("g.q", "f.q")}) AS mind
             |  FROM g${t - 2} g, f${t - 1} f)""".stripMargin
      s"""$upd,
         |f$t AS (SELECT id, q FROM g${t - 1} WHERE mind > 0
         |  ORDER BY mind DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val ff = (1 to kFinal).map(t => s"SELECT $t AS iter, id, q FROM f$t")
      .mkString(" UNION ALL ")
    val localBlock = if (localSteps.isEmpty) "" else localSteps + ",\n"
    val mergeBlock = if (mergeSteps.isEmpty) "" else mergeSteps + ",\n"
    s"""WITH e AS (SELECT CAST($idCol AS BIGINT) AS id,
       |    ${Sampling.duckMd5Bucket(idCol, numBuckets)} AS bucket,
       |    ${duckQuantize(vecCol, scale)} AS q
       |  FROM $table),
       |s AS (SELECT bucket, id, q FROM e
       |  QUALIFY row_number() OVER (PARTITION BY bucket ORDER BY id) = 1),
       |${localBlock}cen AS ($cenUnion),
       |f1 AS (SELECT id, q FROM cen ORDER BY id LIMIT 1),
       |${mergeBlock}ff AS ($ff),
       |ad AS (SELECT e.id, ff.id AS center_id,
       |    CAST(ff.iter AS BIGINT) AS center_iter,
       |    ${d("e.q", "ff.q")} AS dist_q
       |  FROM e, ff),
       |r AS (SELECT *, row_number() OVER (PARTITION BY id
       |    ORDER BY dist_q, center_iter) AS rn FROM ad)
       |SELECT id, center_id, center_iter, dist_q FROM r WHERE rn = 1
       |ORDER BY id""".stripMargin
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
    def d(a: String, b: String) = duckSqDistL2(a, b, dim)
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
       |    ${duckQuantize(vecCol, scale)} AS q
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
