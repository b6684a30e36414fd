package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join — all pairs with Jaccard(tokensₗ, tokensᵣ)
  * ≥ τ, at blocked cost (the SSJoin/ppjoin family: Chaudhuri et al.
  * ICDE '06, Xiao et al. WWW '08). The deterministic complement of
  * [[Dedup.minhashLsh]]: MinHash banding is probabilistic (recall < 1
  * near the threshold, tuned by bands×rows); this operator returns the
  * exact answer and is the right tool when the corpus slice is
  * moderate or an audit needs ground truth — the same blocked-prefix
  * idea as [[FuzzyJoin]], over word tokens instead of character
  * q-grams. (Beyond-ref extension: no join operator over set overlap
  * exists in DataFusion 40.)
  *
  * Blocking: a pair with Jaccard ≥ τ has |A∩B| ≥ τ/(1+τ)·(|A|+|B|),
  * which implies the size filter `min ≥ τ·max` and the PREFIX filter —
  * under one global token order (ascending corpus frequency, rarest
  * first), the pair must share a token among each side's first
  * `|A| − ⌊τ·|A|⌋ + 1` tokens (floor, not ceil: one token longer than
  * the tight prefix is always safe, and immune to a float ceil
  * rounding UP and silently undersizing the prefix — an undersized
  * prefix is a recall bug no oracle would catch on most corpora).
  * Ubiquitous tokens sort out of every prefix, so a corpus-wide
  * stopword cannot trigger the O(n²)-per-common-token blowup.
  * Candidates additionally pass ppjoin's POSITIONAL filter (WW '08 §3,
  * in the per-join filters below).
  *
  * EXACTNESS: the verify computes |A∩B| as an integer and
  * jaccard = inter / (|A|+|B|−inter) — one IEEE division of exact
  * integers, bit-identical cross-engine; the size filter carries a
  * 1e-9 epsilon so a float τ·max rounding up cannot exclude a
  * boundary-true pair (inclusion is harmless — verify is exact).
  *
  * Scale shape: one frequency aggregate, one per-set rank window, a
  * join on prefix tokens only, pair-distinct, then token arrays join
  * back BY ID for the verify. Verify is O(|A|+|B|) per candidate. */
object SetJoin {

  /** Normalize one side to (id, toks, sz). Tokens are deduped AND
    * SORTED once per set (n·log n, paid |corpus| times) so the verify —
    * paid |candidates| times, the quadratic term — is an
    * allocation-free merge walk ([[graft.functions
    * .SortedIntersectCount]]) instead of Spark's interpreted
    * array_intersect building a hash set per pair. NULL ELEMENTS are
    * stripped before anything else (an equi-join on tokens can never
    * block a null, so keeping them in the verify would silently miss
    * truly-matching pairs); empty/null token sets match nothing
    * (similarity is undefined there — and 0/0 = NaN compares as LARGER
    * than tau in Spark but NULL/false in most engines, so excluding
    * them is the only cross-engine-sane contract). */
  private def prepSets(df: DataFrame, id: String, tok: String): DataFrame =
    // Persisted (OperatorCache — engine statements release it on
    // close): the prepped relation feeds the frequency aggregate, the
    // prefix rank AND the verify join — unpersisted, each consumer
    // re-reads (and re-sorts) the whole corpus, 3 source scans per
    // side at 100 TB.
    OperatorCache.persist(
      df.select(col(id).as("id"),
          array_sort(array_distinct(filter(col(tok), x => x.isNotNull)))
            .as("toks"))
        .where(col("toks").isNotNull && size(col("toks")) > 0)
        .withColumn("sz", size(col("toks")).cast("long")))

  private def exploded(df: DataFrame): DataFrame =
    df.select(col("id"), col("sz"), explode(col("toks")).as("tok"))

  /** Join the (id_l, id_r) candidates back to their token arrays and
    * attach the exact integer `inter`. The repartition is a
    * NON-COALESCIBLE spread before the verify: candidate pairs are two
    * longs, so AQE sees a tiny shuffle and coalesces the fused
    * distinct→join→verify pipeline down to a couple of tasks — but the
    * verify's per-ROW cost (a merge walk over two token arrays) is the
    * operator's dominant term, and bytes-based coalescing starves it
    * (measured: 2 tasks over an sf0.1 candidate set, minutes of wall
    * on 32 idle cores). repartition(N, keys) is exempt from AQE
    * coalescing (STATUS round-10 lesson). */
  private def verified(cands: DataFrame, l: DataFrame,
      r: DataFrame): DataFrame =
    cands
      .repartition(OpConf.shufflePartitions(l), col("id_l"), col("id_r"))
      .join(l.select(col("id").as("id_l"), col("toks").as("toks_l"),
        col("sz").as("sz_l")), "id_l")
      .join(r.select(col("id").as("id_r"), col("toks").as("toks_r"),
        col("sz").as("sz_r")), "id_r")
      .withColumn("inter", {
        import org.apache.spark.sql.graftaccess.Internals
        Internals.column(graft.functions.SortedIntersectCount(
          Internals.expression(col("toks_l")),
          Internals.expression(col("toks_r"))))
      })

  /** All (id_l, id_r, inter, sz_l, sz_r, jaccard) with jaccard ≥ tau.
    * `tokL`/`tokR` are array<string> columns; see [[prepSets]] for the
    * null/empty contract. */
  def jaccardJoin(left: DataFrame, right: DataFrame,
      idL: String, tokL: String, idR: String, tokR: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"need 0 < tau <= 1, got $tau")
    val l = prepSets(left, idL, tokL)
    val r = prepSets(right, idR, tokR)
    val el = exploded(l)
    val er = exploded(r)
    val freq = PrefixFilter.frequencies(el, er, Seq("tok"))
    val pLen = col("sz") - floor(lit(tau) * col("sz")) + 1
    val pl = PrefixFilter.prefix(el, freq, Seq("tok"), pLen,
        posCol = Some("pos"))
      .select(col("id").as("id_l"), col("sz").as("szp_l"),
        col("pos").as("pos_l"), col("tok"))
    val pr = PrefixFilter.prefix(er, freq, Seq("tok"), pLen,
        posCol = Some("pos"))
      .select(col("id").as("id_r"), col("sz").as("szp_r"),
        col("pos").as("pos_r"), col("tok"))
    // ε is relative (floor 1e-9): a pathological multi-million-token
    // set's τ·sz product carries rounding error ∝ sz, and an absolute
    // ε would be swallowed — same hazard as the weighted join's sums.
    def relEps(x: org.apache.spark.sql.Column) =
      greatest(lit(1e-9), lit(1e-12) * x)
    val cands = pl.join(pr, "tok")
      .where(least(col("szp_l"), col("szp_r")).cast("double") >=
        lit(tau) * greatest(col("szp_l"), col("szp_r")) -
          relEps(greatest(col("szp_l"), col("szp_r")).cast("double")) &&
        // ppjoin positional filter (Xiao et al. WWW '08 §3): overlap
        // through THIS shared token is at most 1 + the shorter
        // remaining suffix, and a true pair needs overlap
        // ≥ τ/(1+τ)·(|A|+|B|). A true pair's FIRST shared token (global
        // order) always sits inside both prefixes and passes — tokens
        // before it are all non-shared, so a deeper position would
        // already break the τ bound. ε guards the float α; inclusion
        // is harmless, the verify is exact.
        (lit(1) + least(col("szp_l") - col("pos_l"),
          col("szp_r") - col("pos_r"))).cast("double") >=
          lit(tau / (1.0 + tau)) * (col("szp_l") + col("szp_r"))
            .cast("double") -
          relEps((col("szp_l") + col("szp_r")).cast("double")))
      .select("id_l", "id_r").distinct()
    verified(cands, l, r)
      .withColumn("jaccard", col("inter").cast("double") /
        (col("sz_l") + col("sz_r") - col("inter")).cast("double"))
      .where(col("jaccard") >= tau)
      .select(col("id_l"), col("id_r"), col("inter"),
        col("sz_l"), col("sz_r"), col("jaccard"))
  }

  /** EXACT set-CONTAINMENT join — all pairs with
    * |A ∩ B| / |A| ≥ τ (A from `left`): "τ of the left doc's tokens
    * appear in the right doc", the asymmetric question behind quote
    * detection, provenance ("is this doc mostly contained in that
    * one?") and query-subsumption — [[jaccardJoin]]'s machinery with
    * the containment blocking policy (the set containment join of the
    * SSJoin literature, ICDE '06 §4: an OVERLAP constraint t = ⌈τ·|A|⌉
    * that depends on |A| alone).
    *
    * Blocking: only the LEFT side is prefix-cut (first
    * |A| − ⌊τ·|A|⌋ + 1 elements under the shared rare-first order —
    * floor form, one longer than tight, immune to float-ceil
    * undersizing); the right side joins on ALL its elements, because
    * |A| can be small enough that B's achievable prefix bound is its
    * whole set. This stays blocked: prefix elements are corpus-RARE by
    * construction, so each joins O(f) right occurrences — a stopword
    * can never fan out (it never enters a left prefix). Candidates then
    * pass the size filter |B| ≥ τ·|A| and the ppjoin positional filter
    * (overlap through the shared element ≤ 1 + min remaining suffix,
    * must reach τ·|A|); containment = inter / |A| is one IEEE division
    * of exact integers. Same null/empty contract as [[jaccardJoin]]. */
  def containmentJoin(left: DataFrame, right: DataFrame,
      idL: String, tokL: String, idR: String, tokR: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"need 0 < tau <= 1, got $tau")
    val l = prepSets(left, idL, tokL)
    val r = prepSets(right, idR, tokR)
    val el = exploded(l)
    val er = exploded(r)
    val freq = PrefixFilter.frequencies(el, er, Seq("tok"))
    val pl = PrefixFilter.prefix(el, freq,
        Seq("tok"), col("sz") - floor(lit(tau) * col("sz")) + 1,
        posCol = Some("pos"))
      .select(col("id").as("id_l"), col("sz").as("szp_l"),
        col("pos").as("pos_l"), col("tok"))
    // right side: ALL elements, but positions still ride along for the
    // positional filter (rank under the SAME global order)
    val pr = PrefixFilter.prefix(er, freq, Seq("tok"), col("sz"),
        posCol = Some("pos"))
      .select(col("id").as("id_r"), col("sz").as("szp_r"),
        col("pos").as("pos_r"), col("tok"))
    // relative ε, same rationale as jaccardJoin's
    def relEps(x: org.apache.spark.sql.Column) =
      greatest(lit(1e-9), lit(1e-12) * x)
    val cands = pl.join(pr, "tok")
      .where(col("szp_r").cast("double") >=
        lit(tau) * col("szp_l").cast("double") -
          relEps(col("szp_l").cast("double")) &&
        (lit(1) + least(col("szp_l") - col("pos_l"),
          col("szp_r") - col("pos_r"))).cast("double") >=
          lit(tau) * col("szp_l").cast("double") -
          relEps(col("szp_l").cast("double")))
      .select("id_l", "id_r").distinct()
    verified(cands, l, r)
      .withColumn("containment",
        col("inter").cast("double") / col("sz_l").cast("double"))
      .where(col("containment") >= tau)
      .select(col("id_l"), col("id_r"), col("inter"),
        col("sz_l"), col("sz_r"), col("containment"))
  }

  /** EXACT WEIGHTED set-similarity join — all pairs with
    * J_w(A,B) = W(A∩B) / W(A∪B) ≥ τ under integer idf-style token
    * weights `w(t) = N div f(t)` (N = total sets across both sides,
    * f = how many contain t, floor division): the production form of
    * near-dup similarity, where sharing a RARE token means far more
    * than sharing a stopword — plain Jaccard scores "the of and is a"
    * ∩ "the of and is b" at 0.67; weighted, those five stopwords weigh
    * ~5 units against a rare token's ~N. (The weighted ppjoin of Xiao
    * et al. WWW '08 §6; integer weights keep every sum exact and the
    * final similarity ONE IEEE division of exact integers, so the
    * whole operator replays in the oracle.)
    *
    * Blocking (any fixed global order is complete for the weighted
    * prefix bound; rare-first makes it selective): A's prefix keeps
    * tokens while the cumulative weight BEFORE the token is
    * ≤ (1−τ)·W(A) — if no shared token sat in the prefix, the shared
    * weight would all lie in the suffix, whose weight is < τ·W(A) ≤
    * W(A∩B), a contradiction. Candidates then pass the weighted size
    * filter min(W) ≥ τ/(1+τ)·(W_A+W_B) and the weighted positional
    * filter w(t) + min(suffix weights) ≥ the same bound. All blocking
    * comparisons carry a 1e-6 ε (inclusion harmless — verify exact);
    * blocking floats never cross the engine boundary.
    *
    * Verify: relational — candidates fan out over A's tokens and
    * inner-join B's (id, tok), so W(∩) is ONE integer sum per pair;
    * O(|A|) rows per candidate, the weighted analogue of the
    * merge-walk. Two O(1) driver counts (N) are the only actions.
    * Same null/empty contract as [[jaccardJoin]]. */
  def weightedJaccardJoin(left: DataFrame, right: DataFrame,
      idL: String, tokL: String, idR: String, tokR: String,
      tau: Double): DataFrame = {
    require(tau > 0.0 && tau <= 1.0, s"need 0 < tau <= 1, got $tau")
    val l = prepSets(left, idL, tokL)
    val r = prepSets(right, idR, tokR)
    val el = exploded(l)
    val er = exploded(r)
    val n = l.count() + r.count() // N: one scalar per side, O(1) result
    val freq = PrefixFilter.frequencies(el, er, Seq("tok"))
    // integer idf: rare token (f=1) weighs N, corpus-wide token weighs
    // 1. INTEGER division (DIV), not floor(double/double): a double
    // quotient rounding up across an integer boundary would silently
    // diverge from the oracle's `//`.
    val weights = freq.withColumn("w", expr(s"CAST($n DIV f AS BIGINT)"))
    // Blocking epsilons are RELATIVE: the comparands are double
    // products of int64 weight sums, whose rounding error grows with
    // the sums (ulp of 1e13 is ~2e-3 — an absolute 1e-6 would be
    // swallowed and a boundary-true pair silently dropped BEFORE the
    // exact verify: a recall bug no small-corpus oracle could catch).
    // 1e-9 relative dwarfs the ~1e-16-relative product error; the
    // widened cut only admits extra candidates for the verify.
    def relEps(x: org.apache.spark.sql.Column) =
      greatest(lit(1e-6), lit(1e-9) * x)
    def weighted(e: DataFrame, side: String): DataFrame = {
      // SAME global order as every prefix cut (PrefixFilter
      // .globalOrder) — a drifted copy would silently break
      // completeness in whichever variant lagged
      val win = Window.partitionBy("id")
        .orderBy(PrefixFilter.globalOrder(Seq("tok")): _*)
      val cum = e.join(weights, "tok")
        .withColumn("cum", sum(col("w")).over(
          win.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("wsum", sum(col("w")).over(
          win.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      // Persisted: each side feeds the prefix-candidate join, the
      // verify token join and the wsum lookup — unpersisted, the
      // freq/weights join + two window passes would run per consumer.
      OperatorCache.persist(
        cum.select(col("id").as(s"id_$side"), col("tok"),
          col("w"), (col("cum") - col("w")).as(s"before_$side"),
          (col("wsum") - col("cum")).as(s"suffix_$side"),
          col("wsum").as(s"wsum_$side")))
    }
    val wl = weighted(el, "l")
    val wr = weighted(er, "r")
    val wTot = (col("wsum_l") + col("wsum_r")).cast("double")
    val bound = lit(tau / (1.0 + tau)) * wTot - relEps(wTot)
    val cands = wl
      .where(col("before_l").cast("double") <=
        lit(1.0 - tau) * col("wsum_l").cast("double") +
          relEps(col("wsum_l").cast("double")))
      .join(wr.where(col("before_r").cast("double") <=
        lit(1.0 - tau) * col("wsum_r").cast("double") +
          relEps(col("wsum_r").cast("double")))
        .drop("w"), "tok") // w is a function of tok — one copy suffices
      .where(least(col("wsum_l"), col("wsum_r")).cast("double") >= bound &&
        (col("w") + least(col("suffix_l"), col("suffix_r")))
          .cast("double") >= bound)
      .select("id_l", "id_r").distinct()
    // relational verify: pair × A-token rows, inner join B's tokens —
    // only SHARED tokens survive, one integer sum per pair. The spread
    // is by id_l ALONE, deliberately: HashPartitioning(id_l) still
    // satisfies the aggregate's ClusteredDistribution(id_l, id_r) (a
    // subset co-locates), but a repartition on EXACTLY the grouping
    // keys sits where EnsureRequirements would place the aggregate's
    // own exchange and gets optimized out — leaving an
    // ENSURE_REQUIREMENTS exchange AQE happily coalesces onto 2 tasks
    // (PlanSpec pins REPARTITION_BY_NUM survives in all four joins).
    val winter = cands
      .repartition(OpConf.shufflePartitions(l), col("id_l"))
      .join(wl.select(col("id_l"), col("tok"), col("w")), "id_l")
      .join(wr.select(col("id_r"), col("tok")), Seq("id_r", "tok"))
      .groupBy(col("id_l"), col("id_r"))
      .agg(sum(col("w")).cast("long").as("w_inter"))
    winter
      .join(wl.select(col("id_l"), col("wsum_l")).distinct(), "id_l")
      .join(wr.select(col("id_r"), col("wsum_r")).distinct(), "id_r")
      .withColumn("w_jaccard", col("w_inter").cast("double") /
        (col("wsum_l") + col("wsum_r") - col("w_inter")).cast("double"))
      .where(col("w_jaccard") >= tau)
      .select(col("id_l"), col("id_r"), col("w_inter"),
        col("wsum_l").as("w_l"), col("wsum_r").as("w_r"),
        col("w_jaccard"))
  }
}
