package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** BM25 relevance scoring of a document corpus against a term set — the
  * Okapi BM25 ranking function (Robertson & Walker '94; the Lucene
  * `1 + (N − df + 0.5)/(df + 0.5)` idf variant, always positive), the
  * standard lexical tier of retrieval/RAG pipelines and of
  * contamination-style "which training docs match this eval query"
  * audits:
  *
  *   score(d) = Σ_t idf(t) · tf(t,d)·(k1+1)
  *                          / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
  *
  * Distributed shape: tokenize + explode is a projection; the term
  * filter prunes the exploded stream BEFORE the only data shuffle (the
  * per-(doc, term) tf aggregate, map-side combined); document frequency
  * is |terms| rows and joins back broadcast; corpus stats (N, Σdl) ride
  * one broadcast cross join. No all-pairs anything — at 100 TB the cost
  * is one pass over the tokens plus a tf-sized shuffle.
  *
  * Output per matching document: (id, n_terms, sum_qcore, bm25).
  * EXACTNESS split (FIXTURES recipe): `sum_qcore` quantizes the idf-free
  * core — every step (b = 3/4 and 1−b = 1/4 exact binary fractions,
  * single divisions/products on identical operands, ×2^30 exponent
  * shift) is correctly-rounded IEEE, so it is bit-identical
  * cross-engine and the hashable probe column. `bm25` needs `ln` (not
  * correctly rounded) — emitted for USE, spec-checked with tolerance,
  * kept out of the oracle hash like LmScore's avg_logp.
  */
object Bm25 {

  def score(df: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val ws = df.select(col(idCol).as("id"),
      Dedup.words(col(textCol)).as("ws"))
    // corpus stats over ALL documents (empty ones too — they lower
    // avgdl exactly as in the textbook definition)
    val stats = ws.agg(count(lit(1)).as("n_docs"),
      sum(size(col("ws")).cast("bigint")).as("sum_dl"))
    val tf = ws
      .select(col("id"), size(col("ws")).as("dl"), explode(col("ws")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy("id", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val kb = lit(k1)
    val scored = tf
      .join(broadcast(dfreq), Seq("w"))
      .crossJoin(broadcast(stats))
      .select(col("id"),
        // core: parenthesization mirrored verbatim in the oracle SQL —
        // each step is ONE rounded IEEE op on identical operands
        ((col("tf").cast("double") * (kb + lit(1.0))) /
          (col("tf").cast("double") + kb *
            (lit(1.0 - b) + lit(b) *
              (col("dl").cast("double") /
                (col("sum_dl").cast("double") / col("n_docs").cast("double"))))))
          .as("core"),
        log(lit(1.0) +
          ((col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
            (col("df").cast("double") + lit(0.5)))).as("idf"))
    scored.groupBy("id")
      .agg(count(lit(1)).as("n_terms"),
        sum(floor(col("core") * lit(1073741824L)).cast("long")).as("sum_qcore"),
        sum(col("idf") * col("core")).as("bm25"))
  }
}
