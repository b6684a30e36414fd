package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for a retrieval run against relevance
  * judgments — the eval half of the retrieval stack ([[Bm25]] /
  * [[Similarity]] searches / [[Retrieval.rrfFuse]] produce runs;
  * [[Similarity.recallAtK]] covers ANN recall; this scores RANKINGS):
  * per-query reciprocal rank, hits@k and precision@k, the standard IR
  * triple (Voorhees' TREC MRR; Manning et al., IR book ch. 8). Beyond-ref
  * extension like the dedup/ANN family — the reference's DataFusion
  * surface (lib.rs:678) has no retrieval operators.
  *
  * EXACTNESS: reciprocal rank lives in fixed-point micro-units
  * (`unit div first_rel_rank` — ONE integer division, the
  * [[Retrieval]] / [[PageRank]] recipe), counts are integers, so every
  * output row is bit-exact cross-engine; the corpus-level MRR mean is
  * left to the caller (one exact integer sum / one count) so no float
  * division ever picks or orders rows. nDCG is deliberately absent:
  * its log2 discount is not correctly-rounded IEEE, so it could never
  * hash-match — rr/hits/precision carry the same signal exactly.
  *
  * Scale shape: the run is already top-k-per-query, so the qrels join
  * touches (queries × k) rows, shuffles once on (qid, id), and the
  * per-query fold is a map-side-combined aggregate. Nothing scans the
  * corpus.
  */
object RetrievalEval {

  /** Score `run` (qidCol, idCol, rankCol — 1-based, total order within a
    * query) against `qrels` (qidCol, idCol rows = relevant pairs; any
    * extra columns ignored). Emits one row per query that appears in
    * EITHER input (a query with no run rows scores zero; a query with no
    * qrels scores zero with n_rel = 0):
    *
    *   - `n_rel`      total relevant docs for the query
    *   - `n_ret`      run rows within rank ≤ k
    *   - `n_rel_at_k` relevant docs retrieved within rank ≤ k
    *   - `first_rel_rank` rank of the first relevant hit anywhere in
    *     the run, not just within k (0 = none retrieved; a run capped
    *     at K_run by the caller bounds this at K_run)
    *   - `rr_q`       unit div first_rel_rank (0 when none) — fixed-point
    *     reciprocal rank; Σ rr_q / n_queries is MRR in units of `unit`
    */
  def atK(run: DataFrame, qrels: DataFrame, k: Int,
      qidCol: String = "qid", idCol: String = "id", rankCol: String = "rank",
      unit: Long = 1L << 40): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val r = run.select(col(qidCol).as("qid"), col(idCol).as("id"),
      col(rankCol).cast("long").as("rank"))
    val q = qrels.select(col(qidCol).as("qid"), col(idCol).as("id"))
      .distinct().withColumn("__rel", lit(1L))
    r.join(q, Seq("qid", "id"), "full_outer")
      .groupBy("qid")
      .agg(
        sum(when(col("__rel").isNotNull, 1L).otherwise(0L)).as("n_rel"),
        sum(when(col("rank").isNotNull && col("rank") <= k, 1L)
          .otherwise(0L)).as("n_ret"),
        sum(when(col("__rel").isNotNull && col("rank") <= k, 1L)
          .otherwise(0L)).as("n_rel_at_k"),
        coalesce(min(when(col("__rel").isNotNull, col("rank"))), lit(0L))
          .as("first_rel_rank"))
      .withColumn("rr_q",
        when(col("first_rel_rank") > 0,
          expr(s"${unit}L div first_rel_rank")).otherwise(lit(0L)))
  }
}
