package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of retrieval runs — the standard hybrid-search
  * combiner (Cormack, Clarke & Buettcher, SIGIR '09): a document's fused
  * score is Σ over runs of 1/(k + rank). RRF is how a RAG / retrieval
  * pipeline merges a lexical ranking (BM25, [[Bm25]]) with a semantic one
  * (embedding cosine, [[Similarity]]) without score calibration — only
  * RANKS cross the fusion boundary, so the two runs' incomparable score
  * scales never meet. (Beyond-ref extension like the dedup/ANN family:
  * the reference's DataFusion surface at lib.rs:678 has no retrieval
  * operators.)
  *
  * EXACTNESS: the reciprocal lives in fixed-point micro-units —
  * `unit div (k + rank)` is ONE integer division, and integer sums are
  * order-independent — so the fused score is bit-exact under any
  * partitioning and replayable in DuckDB with `//` (the [[PageRank]]
  * recipe; a floating RRF sum over ≥3 runs could never hash-match
  * cross-engine). Quantization is deterministic and shared by both
  * engines, so fused ORDER is identical too.
  *
  * Scale shape: each input run is already top-k-per-query (k ≤ a few
  * hundred), so the union is (runs × k × queries) rows — the fusion
  * aggregate shuffles only that candidate stream on (query, doc), never
  * the corpus; the per-query top-N cut rides the bounded-heap
  * [[graft.plans.TopK]] operator, not a full sort.
  */
object Retrieval {

  /** Fuse ranked runs. Each run must carry `keyCols` (query identifier,
    * may be empty for a single-query fusion), `idCol` (document) and
    * `rankCol` (1-based rank within that run — the caller's ranking MUST
    * be total/deterministic; ties in a run make its ranks ambiguous).
    *
    * Output: keyCols, id, `n_runs` (runs containing the doc), `best_rank`
    * (min rank across runs), `rrf_q` (fixed-point fused score,
    * Σ unit div (kRrf + rank)), `fused_rank` (1-based by rrf_q DESC, id
    * ASC within each key), cut at `topN`.
    */
  def rrfFuse(runs: Seq[DataFrame], keyCols: Seq[String], idCol: String,
      rankCol: String, kRrf: Int = 60, topN: Int = 10,
      unit: Long = 1L << 40): DataFrame = {
    require(runs.nonEmpty, "RRF needs at least one run")
    // rebind the caller's rank column to an internal name before it is
    // spliced into the div expression — a caller-supplied name needing
    // quoting (spaces, dashes) must never reach the SQL parser
    val cols = (keyCols :+ idCol).map(col) :+
      col(rankCol).cast("long").as("__rrf_rank")
    val u = runs.map(_.select(cols: _*)).reduce(_ unionByName _)
    val fused = u
      .groupBy((keyCols :+ idCol).map(col): _*)
      .agg(count(lit(1)).as("n_runs"),
        min(col("__rrf_rank")).as("best_rank"),
        sum(expr(s"${unit}L div (${kRrf}L + __rrf_rank)")).as("rrf_q"))
    graft.plans.TopK.perKey(fused, keyCols,
        Seq(("rrf_q", false), (idCol, true)), k = topN)
      .withColumnRenamed("rank", "fused_rank")
  }

  /** One MMR pick: 1-based selection order, doc id, its integer
    * relevance (dot with the query), the max integer similarity to the
    * previously picked set at pick time (0 for the first pick), and the
    * fixed-point MMR objective `lambdaNum·rel − (lambdaDen−lambdaNum)
    * ·maxsim` it won with. */
  final case class MmrPick(iter: Int, id: Long, relQ: Long,
      maxSimQ: Long, mmrQ: Long)

  private def dotToLit(q: Column, v: Seq[Long]): Column = {
    val c = array(v.map(lit): _*)
    aggregate(zip_with(q, c, (a, b) => a * b), lit(0L), (acc, x) => acc + x)
  }

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR '98): greedily pick the candidate maximizing
    * λ·rel(d) − (1−λ)·max_{s∈picked} sim(d, s) — the relevance/
    * diversity trade-off a RAG context builder uses so the k retrieved
    * chunks don't all say the same thing. The diversity term is the
    * exact dual of [[Coreset.kCenterGreedy]]'s farthest-point rule, and
    * the implementation shares its scale shape.
    *
    * EXACTNESS: vectors are quantized once ([[Coreset.quantize]]),
    * relevance and similarity are integer dot products (MIPS form — no
    * norm division, which could never hash-match cross-engine), and
    * λ = lambdaNum/lambdaDen enters as two integer multipliers, so
    * every argmax (ties by min id) is deterministic and the whole
    * trajectory replays in DuckDB as unrolled CTEs.
    *
    * Scale shape: the running MAX similarity to the picked set is a
    * persisted column — pick t is one shuffle-free job over the
    * persisted (id, q, rel, ms) generation: a top-1 TakeOrdered argmax,
    * then a projection folding in ONLY the newest pick's similarity
    * (`greatest`), persisted as generation t+1. O(k·n·dim) total work,
    * O(k) driver rows. MMR is typically re-ranking a top-few-hundred
    * candidate set, but nothing here needs that: the corpus-wide form
    * is the same plan. */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      queryVec: Seq[Double], k: Int, lambdaNum: Int = 3,
      lambdaDen: Int = 4, scale: Int = 1024): Seq[MmrPick] = {
    require(k >= 1, "MMR needs k >= 1")
    require(lambdaNum > 0 && lambdaNum <= lambdaDen,
      s"need 0 < lambdaNum <= lambdaDen, got $lambdaNum/$lambdaDen")
    val divCoef = (lambdaDen - lambdaNum).toLong
    val qq = queryVec.map(x => math.floor(x * scale).toLong)
    val base = df.select(col(idCol).cast("long").as("id"),
        Coreset.quantize(col(vecCol), scale).as("q"))
      .withColumn("rel", dotToLit(col("q"), qq))
      .transform(OperatorCache.persist)
    val firstRow = base.orderBy(col("rel").desc, col("id")).limit(1)
      .collect().headOption.getOrElse(
        throw new IllegalArgumentException("MMR on an empty candidate set"))
    val first = MmrPick(1, firstRow.getLong(0), firstRow.getLong(2),
      0L, lambdaNum * firstRow.getLong(2))
    var picks = Vector(first)
    var lastVec = firstRow.getSeq[Long](1)
    if (k == 1) { base.unpersist(); return picks }
    var cur = base.filter(col("id") =!= first.id)
      .select(col("id"), col("q"), col("rel"),
        dotToLit(col("q"), lastVec).as("ms"))
      .transform(OperatorCache.persist)
    var prev: DataFrame = null
    var t = 2
    var drained = false
    while (t <= k && !drained) {
      val mmr = (lit(lambdaNum.toLong) * col("rel") -
        lit(divCoef) * col("ms")).as("mmr")
      // the argmax materializes `cur`; the previous generation's blocks
      // are safe to drop now
      val rows = cur.select(col("id"), col("q"), col("rel"), col("ms"), mmr)
        .orderBy(col("mmr").desc, col("id")).limit(1).collect()
      if (prev != null) prev.unpersist()
      if (rows.isEmpty) drained = true
      else {
        val r = rows(0)
        picks :+= MmrPick(t, r.getLong(0), r.getLong(2), r.getLong(3),
          r.getLong(4))
        lastVec = r.getSeq[Long](1)
        prev = cur
        cur = cur.filter(col("id") =!= r.getLong(0))
          .select(col("id"), col("q"), col("rel"),
            greatest(col("ms"), dotToLit(col("q"), lastVec)).as("ms"))
          .transform(OperatorCache.persist)
        t += 1
      }
    }
    cur.unpersist()
    if (prev != null) prev.unpersist()
    base.unpersist()
    picks
  }

  /** DuckDB replay of [[mmrSelect]]: identical quantization, integer
    * dot products, and unrolled per-pick running-max argmax CTEs.
    * `queryPred` selects the ONE query row inside `table` (e.g.
    * "vec_id = 0"); candidates are the complement. Output
    * (iter, id, rel_q, maxsim_q, mmr_q) ORDER BY iter. */
  def mmrOracleSql(table: String, idCol: String, vecCol: String,
      queryPred: String, k: Int, dim: Int, lambdaNum: Int = 3,
      lambdaDen: Int = 4, scale: Int = 1024): String = {
    val divCoef = lambdaDen - lambdaNum
    def dot(a: String, b: String) = Coreset.duckDot(a, b, dim)
    val steps = (2 to k).map { t =>
      val upd =
        if (t == 2)
          s"""d1 AS (SELECT r.id, r.q, r.rel, ${dot("r.q", "c.q")} AS ms
             |  FROM r, c1 c WHERE r.id <> c.id)""".stripMargin
        else
          s"""d${t - 1} AS (SELECT d.id, d.q, d.rel,
             |    greatest(d.ms, ${dot("d.q", "c.q")}) AS ms
             |  FROM d${t - 2} d, c${t - 1} c WHERE d.id <> c.id)""".stripMargin
      s"""$upd,
         |c$t AS (SELECT id, q, rel, ms,
         |    $lambdaNum * rel - $divCoef * ms AS mmr
         |  FROM d${t - 1} ORDER BY mmr DESC, id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (s"SELECT 1 AS it, id, rel, CAST(0 AS BIGINT) AS ms, " +
      s"$lambdaNum * rel AS mmr FROM c1") +:
      (2 to k).map(t => s"SELECT $t AS it, id, rel, ms, mmr FROM c$t")
    val stepsSep = if (steps.isEmpty) "" else ","        // k = 1: no CTEs
    val stepsBlock = if (steps.isEmpty) "" else steps + "\n"
    s"""WITH e AS (SELECT CAST($idCol AS BIGINT) AS id,
       |    ${Coreset.duckQuantize(vecCol, scale)} AS q,
       |    $queryPred AS is_q
       |  FROM $table),
       |qv AS (SELECT q FROM e WHERE is_q),
       |r AS (SELECT e.id, e.q, ${dot("e.q", "qv.q")} AS rel
       |  FROM e, qv WHERE NOT e.is_q),
       |c1 AS (SELECT id, q, rel FROM r ORDER BY rel DESC, id LIMIT 1)$stepsSep
       |${stepsBlock}SELECT CAST(it AS BIGINT) AS iter, id, rel AS rel_q,
       |  ms AS maxsim_q, mmr AS mmr_q
       |FROM (${out.mkString(" UNION ALL ")})
       |ORDER BY iter""".stripMargin
  }
}
