package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Repetition metrics for training-data quality filtering (the
  * Gopher-rules family: "Scaling Language Models" Rae et al. 2021, §A1.1
  * — documents dominated by repeated n-grams are low-quality and get
  * filtered before training; builder-prompt extension surface, absent
  * from the reference whose engine stops at relational ops, lib.rs:678).
  *
  * Two cost classes, chosen per metric:
  *   - duplicate-n-gram FRACTIONS are pure projections (distinct/total
  *     over the per-document gram list) — zero shuffle, pipelined into
  *     the scan stage;
  *   - the TOP-n-gram share needs per-(doc, gram) counting, which a
  *     per-row expression cannot do without quadratic rescans — that one
  *     is relational: explode → two-level aggregate, shuffling (doc_id,
  *     gram) pairs once. At 100 TB the explode output is what a
  *     map-side combine wants: partial counts collapse identical grams
  *     within each scan task before the exchange.
  */
object Repetition {

  /** Raw n-gram list WITH repeats (repetition is the signal here, so no
    * dedup and no short-document fallback — a document shorter than n
    * words has no n-grams). */
  def ngrams(text: Column, n: Int): Column = {
    val ws = Dedup.words(text)
    if (n == 1) ws
    else when(size(ws) >= n,
      transform(sequence(lit(1), size(ws) - (n - 1)),
        i => array_join(slice(ws, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Fraction of n-gram positions occupied by a repeated n-gram:
    * 1 - distinct/total, 0 for documents with no n-grams. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val g = ngrams(text, n)
    when(size(g) > 0,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
      .otherwise(lit(0.0))
  }

  /** Per-document duplicate-gram profile (pure projection, no shuffle):
    * word / bigram / trigram repetition fractions. */
  def dupStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
      dupNgramFrac(t, 1).as("dup_word_frac"),
      dupNgramFrac(t, 2).as("dup_2gram_frac"),
      dupNgramFrac(t, 3).as("dup_3gram_frac"))
  }

  /** Share of n-gram positions taken by the single most frequent n-gram
    * (ties need no break: only the count matters). Relational shape:
    * explode grams in the scan stage → count per (doc, gram) with
    * map-side partial aggregation → max per doc. One exchange, keyed on
    * (doc_id, gram). Output: (id, n_grams, top_cnt, top_frac). */
  def topNgramShare(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val g = df.select(col(idCol).as("id"),
        explode(ngrams(col(textCol), n)).as("gram"))
    g.groupBy(col("id"), col("gram")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"))
      .agg(sum(col("cnt")).as("n_grams"), max(col("cnt")).as("top_cnt"))
      .select(col("id"), col("n_grams"), col("top_cnt"),
        (col("top_cnt").cast("double") / col("n_grams")).as("top_frac"))
  }
}
