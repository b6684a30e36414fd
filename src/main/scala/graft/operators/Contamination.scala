package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: flag corpus documents sharing
  * verbatim n-grams with an evaluation set (the decontamination step of
  * every serious training-data pipeline — e.g. GPT-3's 13-gram overlap
  * rule, Brown et al. 2020 §C; builder-prompt extension surface).
  *
  * Scale shape: both sides explode to DISTINCT per-document n-grams in
  * their scan stages, then meet in ONE join keyed on an 8-byte xxhash64
  * of the gram — the exchange carries (doc_id, hash) pairs, never text.
  * The benchmark side is distinct-collapsed grams from a (relatively)
  * tiny eval suite, so AQE broadcasts it and at 100 TB the corpus side
  * never shuffles at all; per-doc hit counts then aggregate with
  * map-side combine. Hash collisions (2^-64 per candidate pair) can
  * only ADD a false positive — acceptable for a filter whose output is
  * quarantined, and the oracle cross-checks on the gram strings
  * themselves, so the probe would catch a collision at test scale.
  */
object Contamination {

  /** Documents of `corpus` sharing at least one n-gram with `bench`;
    * output (id, n_shared) = count of DISTINCT contaminated grams per
    * document. */
  def overlap(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val cg = corpus.select(col(idCol).as("id"),
        explode(array_distinct(Repetition.ngrams(col(textCol), n)))
          .as("gram"))
      .select(col("id"), xxhash64(col("gram")).as("h"))
    val bg = bench
      .select(explode(array_distinct(Repetition.ngrams(col(textCol), n)))
        .as("gram"))
      .distinct()
      .select(xxhash64(col("gram")).as("h"))
    cg.join(bg, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
