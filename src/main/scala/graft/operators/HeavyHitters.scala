package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftaccess.Internals

/** Heavy-hitter (frequent-term) detection via the Count-Min sketch —
  * the sub-linear-state tier of the exact `q_vocab` GROUP BY (the
  * reference's only frequency surface is DataFusion's exact aggregate,
  * lib.rs:678).
  *
  * Scale shape: [[sketch]] is explode (a Generate, no shuffle) → ONE
  * TypedImperativeAggregate — partials combine per partition, the
  * shuffle carries one depth×width counter matrix per partition instead
  * of the vocabulary. [[estimates]] broadcasts the one-row sketch and
  * evaluates `min_i counters[i][bucket_i(term)]` as a pure projection.
  * The two-pass [[heavyHitters]] composition (build sketch, re-scan for
  * candidate terms, keep those estimated ≥ minCount) pays one bounded
  * vocab-sized distinct; at 100 TB the candidate set can instead come
  * from any cheap source (yesterday's vocabulary, a sampled scan) —
  * the sketch itself never materializes per-term state.
  *
  * All counters are integer sums (order-independent ⇒ deterministic
  * under any partitioning) and the bucket function is the md5-slice
  * recipe, so a DuckDB oracle replays estimate values bit-exactly.
  */
object HeavyHitters {

  /** One-row DataFrame with the flat depth×width counter matrix `cms`
    * over the lower-cased whitespace words of `textCol`. */
  def sketch(df: DataFrame, textCol: String,
      depth: Int = 4, width: Int = 1 << 16): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("__term"))
      .agg(Internals.column(
        graft.functions.CountMinSketch(
          Internals.expression(col("__term")), depth, width)
          .toAggregateExpression()).as("cms"))

  /** Bucket of `term` for sketch row i — the md5-hex-slice recipe
    * (same value the kernel computes from the digest bytes). */
  private def bucketCol(term: Column, i: Int, width: Int): Column =
    conv(substring(md5(term), 1 + 8 * i, 8), 16, 10).cast("long") % width

  /** CMS estimate per row of `terms`: broadcast the one-row sketch,
    * take the min hit counter across the depth rows. Pure projection
    * after the broadcast — no shuffle. */
  def estimates(terms: DataFrame, termCol: String, sketchDf: DataFrame,
      depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    val hits = (0 until depth).map { i =>
      element_at(col("cms"),
        (lit(i * width) + bucketCol(col(termCol), i, width)).cast("int") + 1)
    }
    val est = if (hits.size == 1) hits.head else least(hits: _*)
    terms.crossJoin(broadcast(sketchDf))
      .select(col(termCol), est.as("est"))
  }

  /** Two-pass heavy hitters: sketch the corpus, then estimate every
    * distinct term and keep those with estimated count ≥ minCount.
    * CMS never undercounts, so recall is exact; collisions can only
    * add false positives (bounded by ε·N at width e/ε). */
  def heavyHitters(df: DataFrame, textCol: String, minCount: Long,
      depth: Int = 4, width: Int = 1 << 16): DataFrame = {
    val sk = sketch(df, textCol, depth, width)
    val terms = df.select(explode(Dedup.words(col(textCol))).as("term"))
      .distinct()
    estimates(terms, "term", sk, depth, width)
      .filter(col("est") >= minCount)
  }
}
