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
  * that `max(len) ≤ q−1+k·q` — take a separate short×short path (a
  * length-filtered join over the tiny short slice); strings shorter
  * than q can only truly match within that slice, so the two paths are
  * disjoint AND together complete.
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
      maxDist: Int, q: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    require(q >= 1, "gram width must be positive")
    val l = left.select(col(idL).as("id_l"), col(strL).as("s_l"))
      .where(col("s_l").isNotNull)
    val r = right.select(col(idR).as("id_r"), col(strR).as("s_r"))
      .where(col("s_r").isNotNull)
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
        lit(prefixLen))
      .select(col("id").as("id_l"), col("len").as("len_l"),
        col("gram"), col("occ"))
    val pr = PrefixFilter.prefix(gr, freq, Seq("gram", "occ"),
        lit(prefixLen))
      .select(col("id").as("id_r"), col("len").as("len_r"),
        col("gram"), col("occ"))
    val gramCands = pl.join(pr, Seq("gram", "occ"))
      // length filter (necessary for ed ≤ k), and only pairs the count
      // bound can reason about — the short slice is the other path
      .where(abs(col("len_l") - col("len_r")) <= maxDist &&
        greatest(col("len_l"), col("len_r")) > shortBound)
      .select("id_l", "id_r").distinct()
    val shortCands = l.where(length(col("s_l")) <= shortBound)
      .crossJoin(r.where(length(col("s_r")) <= shortBound))
      .where(abs(length(col("s_l")) - length(col("s_r"))) <= maxDist)
      .select("id_l", "id_r")
    gramCands.unionByName(shortCands)
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
