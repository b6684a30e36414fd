package graft.probes

import graft.{Probe, Tables}
import graft.operators.{Bm25, Coreset, Dedup, Retrieval, RetrievalEval, Similarity}
import org.apache.spark.sql.functions._

/** Retrieval-fusion and data-selection probes: reciprocal-rank fusion of
  * a lexical (BM25) and a semantic (embedding-cosine) run, and greedy
  * k-center coreset selection — both integer-exact end to end (fixed
  * point / quantized squared-L2), so the full trajectory hash-matches
  * the DuckDB replay.
  */
object Selection {

  private val duckWords =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  private val RrfTerms = Seq("table", "query", "spark", "join", "stream")
  private val RrfUnit = 1L << 40 // 1099511627776

  val probes: Seq[Probe] = Seq(

    // Hybrid retrieval: BM25 top-20 (ranked by the quantized idf-free
    // core — integer-exact) fused with embedding-cosine top-20 against
    // the vec_id=0 query vector via fixed-point RRF. Ranks are the only
    // thing crossing the fusion boundary; the fused score is an integer
    // sum of integer divisions, so selection AND order hash-match.
    Probe.df("q_retrieval_rrf",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |st AS (SELECT count(*) AS n_docs,
         |               CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM w),
         |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS wd FROM w),
         |tf AS (SELECT doc_id, dl, wd, count(*) AS tf FROM t
         |       WHERE wd IN ('table','query','spark','join','stream')
         |       GROUP BY 1, 2, 3),
         |p AS (SELECT tf.doc_id,
         |    (tf.tf::DOUBLE * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |  / (tf.tf::DOUBLE + CAST(1.2 AS DOUBLE) *
         |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
         |        (tf.dl::DOUBLE / (st.sum_dl::DOUBLE / st.n_docs::DOUBLE))))
         |    AS core
         |  FROM tf, st),
         |bs AS (SELECT doc_id,
         |    CAST(sum(CAST(floor(core * 1073741824) AS BIGINT)) AS BIGINT)
         |      AS s
         |  FROM p GROUP BY doc_id),
         |lr AS (SELECT id, rank FROM (
         |    SELECT doc_id AS id, CAST(row_number() OVER
         |      (ORDER BY s DESC, doc_id) AS BIGINT) AS rank FROM bs)
         |  WHERE rank <= 20),
         |qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |sc AS (SELECT c.vec_id AS id,
         |    list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
         |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
         |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))) AS cos
         |  FROM embeddings c, qv q WHERE c.vec_id <> 0),
         |sr AS (SELECT id, rank FROM (
         |    SELECT id, CAST(row_number() OVER
         |      (ORDER BY cos DESC, id) AS BIGINT) AS rank FROM sc)
         |  WHERE rank <= 20),
         |u AS (SELECT * FROM lr UNION ALL SELECT * FROM sr),
         |f AS (SELECT id, CAST(count(*) AS BIGINT) AS n_runs,
         |    CAST(min(rank) AS BIGINT) AS best_rank,
         |    CAST(sum($RrfUnit // (60 + rank)) AS BIGINT) AS rrf_q
         |  FROM u GROUP BY id),
         |r AS (SELECT *, CAST(row_number() OVER
         |    (ORDER BY rrf_q DESC, id) AS INT) AS fused_rank FROM f)
         |SELECT id, n_runs, best_rank, rrf_q, fused_rank FROM r
         |WHERE fused_rank <= 10
         |ORDER BY fused_rank""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val lex = Bm25.score(docs, "doc_id", "text", RrfTerms)
        .select(col("id"), col("sum_qcore"))
      val lr = graft.plans.TopK.perKey(lex, Seq.empty,
          Seq(("sum_qcore", false), ("id", true)), k = 20)
        .select(col("id"), col("rank"))
      val e = Tables.load(s, dir, "embeddings")
      val sr = Similarity.bruteForceTopK(
          e.filter(col("vec_id") === 0), e, "vec_id", "embedding", 20)
        .select(col("nid").as("id"), col("rank"))
      Retrieval.rrfFuse(Seq(lr, sr), Seq.empty, "id", "rank",
          kRrf = 60, topN = 10, unit = RrfUnit)
        .select(col("id"), col("n_runs"), col("best_rank"), col("rrf_q"),
          col("fused_rank"))
        .orderBy("fused_rank")
    },

    // MMR diversity re-ranking against the vec_id=0 query: integer MIPS
    // relevance + running-max integer similarity, λ=3/4 as two integer
    // multipliers — every greedy pick is bit-exact, so the oracle
    // replays the whole trajectory as unrolled CTEs (the k-center
    // recipe with max-sim in place of min-dist).
    Probe.df("q_retrieval_mmr",
      Retrieval.mmrOracleSql("embeddings", "vec_id", "embedding",
        "vec_id = 0", k = 8, dim = 64)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val qv = e.filter(col("vec_id") === 0)
        .select(col("embedding")).collect()(0)
        .getSeq[Float](0).map(_.toDouble).toSeq
      val picks = Retrieval.mmrSelect(
        e.filter(col("vec_id") =!= 0), "vec_id", "embedding", qv, k = 8)
      import s.implicits._
      picks.toDF()
        .select(col("iter").cast("long").as("iter"), col("id"),
          col("relQ").as("rel_q"), col("maxSimQ").as("maxsim_q"),
          col("mmrQ").as("mmr_q"))
        .orderBy("iter")
    },

    // Greedy k-center coreset (farthest-point-first) over the embedding
    // table: quantized integer squared-L2 makes every argmax step and
    // the final nearest-center assignment bit-exact, so the DuckDB
    // oracle replays the entire greedy trajectory as unrolled CTEs.
    Probe.df("q_coreset_kcenter",
      Coreset.oracleSql("embeddings", "vec_id", "embedding",
        k = 6, dim = 64)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val centers = Coreset.kCenterGreedy(e, "vec_id", "embedding", k = 6)
      Coreset.assign(e, "vec_id", "embedding", centers).orderBy("id")
    },

    // Merge-and-reduce k-center (the coreset scale path): md5-bucket
    // deal → all buckets' greedy sweeps run simultaneously (ONE
    // bounded-heap argmax job per iteration) → driver merge greedy over
    // the bucket centers → shuffle-free assignment. Semantic buckets
    // (not physical partitions) keep the whole composition
    // deterministic, so the oracle replays both phases end to end.
    Probe.df("q_coreset_merge",
      Coreset.shardedOracleSql("embeddings", "vec_id", "embedding",
        numBuckets = 4, kPerBucket = 3, kFinal = 4, dim = 64)) { (s, dir) =>
      val e = Tables.load(s, dir, "embeddings")
      val (_, merged) = Coreset.kCenterSharded(e, "vec_id", "embedding",
        numBuckets = 4, kPerBucket = 3, kFinal = 4)
      Coreset.assign(e, "vec_id", "embedding", merged).orderBy("id")
    },

    // Ranking-metric eval: three single-term BM25 runs scored against
    // sparse tf>=6 relevance judgments (sparser than the ranking signal,
    // so hits, precision counts and first_rel_rank genuinely vary per
    // query) — per-query hits@10, precision counts and fixed-point
    // reciprocal rank, all integers (the nDCG log2 discount is
    // deliberately absent — not correctly-rounded IEEE).
    Probe.df("q_retrieval_eval",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |st AS (SELECT count(*) AS n_docs,
         |               CAST(sum(len(ws)) AS BIGINT) AS sum_dl FROM w),
         |t AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS wd FROM w),
         |tf AS (SELECT wd AS qid, doc_id, dl, count(*) AS tf FROM t
         |       WHERE wd IN ('table','spark','stream')
         |       GROUP BY 1, 2, 3),
         |p AS (SELECT qid, doc_id,
         |    (tf.tf::DOUBLE * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
         |  / (tf.tf::DOUBLE + CAST(1.2 AS DOUBLE) *
         |      (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) *
         |        (tf.dl::DOUBLE / (st.sum_dl::DOUBLE / st.n_docs::DOUBLE))))
         |    AS core
         |  FROM tf, st),
         |run AS (SELECT qid, id, rank FROM (
         |    SELECT qid, doc_id AS id, CAST(row_number() OVER
         |      (PARTITION BY qid ORDER BY
         |        CAST(floor(core * 1073741824) AS BIGINT) DESC, doc_id)
         |      AS BIGINT) AS rank FROM p)
         |  WHERE rank <= 50),
         |qr AS (SELECT qid, doc_id AS id, 1 AS rel FROM tf WHERE tf >= 6),
         |f AS (SELECT coalesce(r.qid, q.qid) AS qid, r.rank, q.rel
         |  FROM run r FULL JOIN qr q ON r.qid = q.qid AND r.id = q.id),
         |m AS (SELECT qid,
         |    CAST(sum(CASE WHEN rel IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_rel,
         |    CAST(sum(CASE WHEN rank IS NOT NULL AND rank <= 10
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_ret,
         |    CAST(sum(CASE WHEN rel IS NOT NULL AND rank <= 10
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_at_k,
         |    CAST(coalesce(min(CASE WHEN rel IS NOT NULL THEN rank END), 0)
         |      AS BIGINT) AS first_rel_rank
         |  FROM f GROUP BY qid)
         |SELECT qid, n_rel, n_ret, n_rel_at_k, first_rel_rank,
         |  CAST(CASE WHEN first_rel_rank > 0
         |    THEN $RrfUnit // first_rel_rank ELSE 0 END AS BIGINT) AS rr_q
         |FROM m ORDER BY qid""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val terms = Seq("table", "spark", "stream")
      val all = terms.map { t =>
        Bm25.score(docs, "doc_id", "text", Seq(t))
          .select(lit(t).as("qid"), col("id"), col("sum_qcore"))
      }.reduce(_ unionByName _)
      val run = graft.plans.TopK.perKey(all, Seq("qid"),
          Seq(("sum_qcore", false), ("id", true)), k = 50)
        .select(col("qid"), col("id"), col("rank"))
      val qrels = docs
        .select(col("doc_id").as("id"),
          explode(Dedup.words(col("text"))).as("w"))
        .where(col("w").isin(terms: _*))
        .groupBy(col("w").as("qid"), col("id"))
        .agg(count(lit(1)).as("tf"))
        .where(col("tf") >= 6)
        .select(col("qid"), col("id"))
      RetrievalEval.atK(run, qrels, k = 10, unit = RrfUnit)
        .orderBy("qid")
    })
}
