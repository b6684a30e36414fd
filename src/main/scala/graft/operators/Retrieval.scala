package graft.operators

import org.apache.spark.sql.DataFrame
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
}
