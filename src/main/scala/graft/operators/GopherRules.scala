package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher quality-filter rules (Rae et al. 2021, "Scaling Language
  * Models: ...Gopher", Appendix A1.1) — the published heuristic battery
  * most open corpus pipelines reuse (MassiveText, RefinedWeb, Dolma):
  *
  *  - word count in [minWords, maxWords] (paper: 50..100,000);
  *  - mean word length in [3, 10];
  *  - symbol-to-word ratio (`#` or `...`) ≤ 0.1;
  *  - ≥ 80% of words contain an alphabetic character;
  *  - ≥ 2 hits from the 8-word Gopher stoplist (the/be/to/of/and/
  *    that/have/with).
  *
  * Everything is a projection over one tokenize (zero shuffle); ratios
  * are single IEEE divisions of integer counts, so the DuckDB oracle is
  * bit-exact. HOF lambdas run interpreted — fine for a probe; the
  * repetition rules from the same appendix already run as kernel
  * projections in [[Repetition]], and a hot 100 TB path would fold these
  * counters into [[graft.functions.TextStatsKernel]] the same way.
  */
object GopherRules {

  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document metrics + the keep flag. */
  def qualityFlags(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val ws = Dedup.words(col(textCol))
    val wc = size(ws)
    val sumLen = aggregate(transform(ws, w => length(w)),
      lit(0L), (acc, x) => acc + x)
    val nAlpha = size(filter(ws, w => w.rlike("[a-z]")))
    val nStop = size(filter(ws, w => w.isInCollection(Stopwords)))
    val hashes = length(col(textCol)) -
      length(regexp_replace(col(textCol), "#", ""))
    val ellipses = (length(col(textCol)) -
      length(regexp_replace(col(textCol), "\\.\\.\\.", ""))) / lit(3)
    df.select(col(idCol),
        wc.as("n_words"),
        (sumLen.cast("double") / greatest(wc, lit(1))).as("mean_word_len"),
        ((hashes + ellipses).cast("double") / greatest(wc, lit(1)))
          .as("symbol_ratio"),
        (nAlpha.cast("double") / greatest(wc, lit(1))).as("alpha_frac"),
        nStop.as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("alpha_frac") >= 0.8 &&
        col("stop_hits") >= 2)
  }

  /** DuckDB replay over relation `rel(id, text)` (same divisions). */
  def oracleSql(rel: String, idCol: String,
      minWords: Int = 50, maxWords: Int = 100000): String = {
    val ws = """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""
    val stops = Stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    s"""w AS (SELECT $idCol, text, $ws AS ws FROM $rel),
       |m AS (SELECT $idCol,
       |  len(ws) AS n_words,
       |  CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |    / greatest(len(ws), 1) AS mean_word_len,
       |  CAST((length(text) - length(replace(text, '#', ''))) +
       |       (length(text) - length(replace(text, '...', ''))) // 3
       |    AS DOUBLE) / greatest(len(ws), 1) AS symbol_ratio,
       |  CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
       |    AS DOUBLE) / greatest(len(ws), 1) AS alpha_frac,
       |  len(list_filter(ws, x -> list_contains($stops, x))) AS stop_hits
       |  FROM w),
       |g AS (SELECT *,
       |  (n_words BETWEEN $minWords AND $maxWords)
       |    AND (mean_word_len BETWEEN 3.0 AND 10.0)
       |    AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
       |    AND stop_hits >= 2 AS keep
       |  FROM m)""".stripMargin
  }
}
