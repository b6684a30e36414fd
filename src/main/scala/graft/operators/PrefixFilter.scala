package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The shared prefix-filter core of [[FuzzyJoin]] (q-gram elements) and
  * [[SetJoin]] (tokens): ONE global element order — ascending corpus
  * frequency, ties by the element key — and a per-set prefix cut under
  * it. Correctness of both "recall-complete" operators hangs on this
  * order being (a) total and (b) IDENTICAL on both join sides, so the
  * logic lives once: a drift between two hand-mirrored copies would
  * silently break completeness in whichever copy lagged. */
private[operators] object PrefixFilter {

  /** THE global element order — ascending corpus frequency, ties by
    * the element key — used by every prefix cut AND by
    * [[SetJoin.weightedJaccardJoin]]'s cumulative-weight cut. One
    * definition: completeness of every blocked join hangs on both
    * sides (and both the counted and weighted variants) sorting
    * identically. */
  def globalOrder(keyCols: Seq[String]): Seq[Column] =
    col("f") +: keyCols.map(col)

  /** Corpus frequency of each element over the union of both sides.
    * `keyCols` are the element-identity columns. */
  def frequencies(a: DataFrame, b: DataFrame,
      keyCols: Seq[String]): DataFrame =
    a.select(keyCols.map(col): _*)
      .unionByName(b.select(keyCols.map(col): _*))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("f"))

  /** Keep each `id`'s first `prefixLen` elements under the global
    * (frequency, keyCols…) order. `e` must carry an `id` column plus
    * `keyCols`; other columns pass through. `posCol`, when set, retains
    * each kept element's 1-based rank in the id's FULL ordered element
    * list under that name — the input to ppjoin's positional filter
    * (Xiao et al. WWW '08 §3): a shared element at position p leaves at
    * most `size − p` elements after it, bounding the achievable overlap
    * BEFORE the verify runs. */
  def prefix(e: DataFrame, freq: DataFrame, keyCols: Seq[String],
      prefixLen: Column, posCol: Option[String] = None,
      broadcastFreq: Boolean = false): DataFrame = {
    // Build-side pinning (r18): the planner sizes this join from
    // ESTIMATES — the element side is a cheap projection of a cached
    // corpus (small estimate) while the freq side is an aggregate over
    // a union of two subtrees (estimate inherits the big child) — and
    // it picked the ELEMENT side as the broadcast build on both
    // q_join_fuzzy (20 MB, collectTime 1.45 s per side) and the SetJoin
    // probes (9.4 MB, ~0.6 s per side) over frequency tables of 39 KB /
    // 0.5 MB. freq ≤ elems by construction (it aggregates the element
    // union), so elems must never be the build side. Callers whose
    // element domain is structurally bounded (FuzzyJoin: distinct
    // q-grams × occ ≤ charset^q × max-occ, a few thousand rows at ANY
    // corpus scale) pass broadcastFreq = true; for vocabulary-sized
    // domains (SetJoin tokens) the default pins a SHUFFLED-HASH join
    // with freq as the per-partition build — no driver collect, and the
    // right shape at 100 TB where neither side broadcasts (AQE's skew
    // split still applies to shuffled-hash joins).
    val f = if (broadcastFreq) broadcast(freq) else freq.hint("shuffle_hash")
    val ranked = e.join(f, keyCols)
      .withColumn("__rk", row_number().over(
        Window.partitionBy("id").orderBy(globalOrder(keyCols): _*)))
      .where(col("__rk") <= prefixLen)
    posCol match {
      case Some(p) => ranked.withColumnRenamed("__rk", p).drop("f")
      case None => ranked.drop("__rk", "f")
    }
  }
}
