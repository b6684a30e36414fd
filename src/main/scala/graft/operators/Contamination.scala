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

  /** Streaming-tier decontamination flag: the bench grams compress into
    * ONE bloom-filter binary (built batch-side with Spark's own
    * BloomFilterAggregate, collected once — sketch-sized, not
    * data-sized) and every document probes it inside a pure projection,
    * so the check runs UNCHANGED on a streaming ingest: zero state, no
    * shuffle, no watermark. At 100 TB the corpus never moves — the
    * few-MB filter rides into the scan stage as a literal, the same
    * shape as [[BloomJoin.bloomProbe]].
    *
    * Output (id, maybe_contaminated): bloom errors are ONE-SIDED — a
    * false flag happens at the filter's fpp, a false clean never — so
    * the streaming tier routes flagged docs to the exact [[overlap]]
    * for offline verification and clean docs straight through. */
  def streamFlag(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, expectedItems: Long = 1000000L): DataFrame = {
    val bytes = bench
      .select(explode(array_distinct(Repetition.ngrams(col(textCol), n)))
        .as("gram"))
      .agg(BloomJoin.bloomAgg(col("gram"), expectedItems).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val grams = array_distinct(Repetition.ngrams(col(textCol), n))
    val flagged =
      if (bytes == null) lit(false) // empty bench: nothing to match
      else exists(grams, g => BloomJoin.mightContain(lit(bytes), g))
    corpus.select(col(idCol).as("id"),
      coalesce(flagged, lit(false)).as("maybe_contaminated"))
  }
}
