package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance (fuzzy string) join — the entity-resolution tier a
  * curation pipeline uses to match near-identical names/titles across
  * corpora where [[Dedup]]'s token shingles are too coarse (one-char
  * typos, OCR slips). Candidates come from PREFIX-FILTERED q-gram
  * blocking (Chaudhuri/Ganti/Kaushik's SSJoin primitive, ICDE '06, on
  * the Gravano VLDB '01 count bound), then the exact `levenshtein`
  * verifies — recall-COMPLETE, so the blocked plan must equal the
  * naive cross join. (Beyond-ref extension: DataFusion 40 has
  * `levenshtein` the scalar but no join operator over it.)
  *
  * Why prefix filtering and not a plain join on all grams: two strings
  * within edit distance k must share ≥ `max(g_s,g_t) − k·q` of their
  * multiset q-grams (each edit destroys ≤ q grams; g = len−q+1), but
  * joining on EVERY gram explodes quadratically on ubiquitous grams —
  * a corpus of "entity NNNN corporation" names shares ~20 grams across
  * ALL rows, and the all-grams join is O(n²) per such gram (measured:
  * sf0.1's 5k names ran minutes). The prefix filter keeps completeness
  * at blocked cost: expand each gram occurrence into an element
  * (gram, occ) — multiset intersection becomes SET intersection — fix
  * ONE global element order (ascending corpus frequency, rarest
  * first), and keep each string's first `min(g, k·q+1)` elements. A
  * pair meeting the count bound MUST share an element inside both
  * prefixes (a true match can miss at most k·q of either side's
  * elements), so joining only the rare prefix elements loses nothing —
  * and ubiquitous grams sort last, out of every prefix.
  *
  * Pairs the bound cannot reason about — both strings short enough
  * that `max(len) ≤ q−1+k·q` — take a separate short×short path:
  * a LENGTH-BUCKET equi-join (each left short string emits bucket
  * keys len−k…len+k; right joins on its own length), which generates
  * exactly the |len_l−len_r| ≤ k pairs — all the q-gram bound can say
  * about short strings — without a cartesian-product node, so a corpus
  * dominated by short codes (tickers, SKUs) still hash-joins. Strings
  * shorter than q can only truly match within that slice, so the two
  * paths are disjoint AND together complete.
  *
  * Candidates on the gram path additionally pass ppjoin's POSITIONAL
  * filter (Xiao et al. WWW '08 §3): a shared element at ranks
  * (p_l, p_r) in the two full ordered element lists bounds the
  * achievable overlap by `1 + min(g_l−p_l, g_r−p_r)`, which must reach
  * the count bound `max(g_l,g_r) − k·q`; a true pair's FIRST shared
  * element (global order) always passes — everything before it is
  * non-shared, so if it sat past either prefix the count bound would
  * already be violated — and the verify is the dominant stage, so
  * cutting candidates here is the cheapest win. All integers: exact.
  *
  * Scale shape: one frequency aggregate over (gram, occ) elements, one
  * per-string rank window (partitioned BY STRING — short rows), a join
  * on prefix elements only, pair-distinct, then the exact verify joins
  * strings back BY ID. Edit-distance verification is O(len²) per
  * surviving candidate — this operator is for SHORT strings (names,
  * titles, keys), not documents.
  */
object FuzzyJoin {

  /** Expanded positional-multiset elements per string:
    * (id, len, gram, occ). `occ` numbers duplicate grams within one
    * string, so multiset gram intersection == set intersection of
    * (gram, occ) elements. Strings shorter than q produce no rows
    * (the short path owns them). */
  private def gramElems(df: DataFrame, q: Int): DataFrame =
    df.select(col("id"), col("s"), length(col("s")).as("len"))
      .where(col("len") >= q)
      .select(col("id"), col("len"),
        explode(transform(sequence(lit(1), col("len") - (q - 1)),
          i => col("s").substr(i, lit(q)))).as("gram"))
      .withColumn("occ", row_number().over(
        Window.partitionBy("id", "gram").orderBy("gram")).cast("long"))

  /** All (id_l, id_r, dist) pairs with `levenshtein ≤ maxDist`,
    * exactly the naive cross join's answer at blocked cost. */
  def editDistanceJoin(left: DataFrame, right: DataFrame,
      idL: String, strL: String, idR: String, strR: String,
      maxDist: Int, q: Int = 4): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(q >= 1, "gram width must be positive")
    // Persisted (OperatorCache): each side feeds the gram expansion,
    // the short-slice bucket join AND the verify join — unpersisted,
    // three source scans per side at 100 TB.
    val l = OperatorCache.persist(
      left.select(col(idL).as("id_l"), col(strL).as("s_l"))
        .where(col("s_l").isNotNull))
    val r = OperatorCache.persist(
      right.select(col(idR).as("id_r"), col(strR).as("s_r"))
        .where(col("s_r").isNotNull))
    val shortBound = q - 1 + maxDist * q
    val prefixLen = maxDist * q + 1
    val gl = gramElems(
      l.select(col("id_l").as("id"), col("s_l").as("s")), q)
    val gr = gramElems(
      r.select(col("id_r").as("id"), col("s_r").as("s")), q)
    // ONE global element order shared by both sides (PrefixFilter):
    // rare-first is what makes the prefixes selective
    val freq = PrefixFilter.frequencies(gl, gr, Seq("gram", "occ"))
    val pl = PrefixFilter.prefix(gl, freq, Seq("gram", "occ"),
        lit(prefixLen), posCol = Some("pos"), broadcastFreq = true)
      .select(col("id").as("id_l"), col("len").as("len_l"),
        col("pos").as("pos_l"), col("gram"), col("occ"))
    val pr = PrefixFilter.prefix(gr, freq, Seq("gram", "occ"),
        lit(prefixLen), posCol = Some("pos"), broadcastFreq = true)
      .select(col("id").as("id_r"), col("len").as("len_r"),
        col("pos").as("pos_r"), col("gram"), col("occ"))
    // g = len − (q−1) gram elements per string
    val gL = col("len_l") - lit(q - 1)
    val gR = col("len_r") - lit(q - 1)
    val gramCands = pl.join(pr, Seq("gram", "occ"))
      // length filter (necessary for ed ≤ k), and only pairs the count
      // bound can reason about — the short slice is the other path
      .where(abs(col("len_l") - col("len_r")) <= maxDist &&
        greatest(col("len_l"), col("len_r")) > shortBound &&
        // ppjoin positional filter: overlap through THIS shared element
        // is at most 1 + the shorter remaining suffix, and must reach
        // the Gravano count bound. Integer arithmetic — exact.
        lit(1) + least(gL - col("pos_l"), gR - col("pos_r")) >=
          greatest(gL, gR) - lit(maxDist * q))
      .select("id_l", "id_r").distinct()
    // Short×short: the gram bound says nothing below shortBound, so the
    // only blocking available is the length filter itself — realized as
    // a length-BUCKET equi-join (left emits len−k…len+k, right joins on
    // its own length; each qualifying pair arrives exactly once, at
    // bucket len_r), NOT a crossJoin: a corpus dominated by short codes
    // would make a cartesian node O(n²) shuffle-free but O(n²) work,
    // while the hash join only meets same-length-class rows.
    val shortCands = l.where(length(col("s_l")) <= shortBound)
      .select(col("id_l"), length(col("s_l")).as("len_l"))
      .withColumn("bkt",
        explode(sequence(col("len_l") - maxDist, col("len_l") + maxDist)))
      .join(r.where(length(col("s_r")) <= shortBound)
        .select(col("id_r"), length(col("s_r")).as("bkt")), "bkt")
      .select("id_l", "id_r")
    // Non-coalescible spread before the verify: candidates are two
    // longs, so AQE's bytes-based coalescing would fuse the expensive
    // per-pair DP onto a couple of tasks (same hazard as SetJoin —
    // measured there). repartition(N, keys) is exempt (STATUS r10).
    gramCands.unionByName(shortCands)
      .repartition(OpConf.shufflePartitions(left),
        col("id_l"), col("id_r"))
      .join(l, "id_l").join(r, "id_r")
      // THRESHOLD levenshtein: banded O(k·len) DP that returns -1 past
      // maxDist — the verify dominates the operator's runtime and the
      // unbounded 2-arg form pays full O(len²) per candidate for a
      // distance we only need up to k
      .withColumn("dist",
        levenshtein(col("s_l"), col("s_r"), maxDist).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_l"), col("id_r"), col("dist"))
  }
}
