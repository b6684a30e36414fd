package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Language identification — the standard curation pre-filter a
  * training-data pipeline runs before quality rules (CCNet/Gopher both
  * gate on it; the reference's engine has no text ops — lib.rs:678).
  *
  * Method: the public Cavnar–Trenkle construction ("N-Gram-Based Text
  * Categorization", 1994) — per-language profiles of the most frequent
  * word-boundary-padded character trigrams, documents scored by summing
  * INTEGER rank points of the grams they contain, argmax over languages.
  * fastText-style systems hash the grams into feature buckets; with a
  * profile this small the exact strings ride a broadcast join instead
  * (no hash collisions to reason about, and the DuckDB oracle can replay
  * the model verbatim). Non-Latin scripts short-circuit on script
  * detection (CJK codepoint ratio) before the trigram vote — the way
  * production identifiers dispatch scripts — so the Latin model never
  * has to out-vote a script it cannot see.
  *
  * Everything is integer arithmetic end-to-end: scores are exact,
  * order-independent under partial aggregation, and hash-identical
  * cross-engine (FIXTURES.md quantized-int64 recipe, trivially).
  *
  * Plan shape at 100 TB: one projection normalizes text, the gram
  * explode feeds a BROADCAST join against the ~150-row model that
  * DROPS every non-profile gram before anything shuffles; the single
  * real exchange carries (id, lang, partial score) — at most
  * #languages rows per doc per partition after map-side combine — and
  * the argmax is a second, doc-keyed aggregate over #docs×#languages
  * rows. No driver state, no UDFs, whole-stage codegen throughout.
  */
object LangId {

  /** Built-in seed profiles: top word-boundary-padded trigrams per
    * language, most-indicative first (points = position from the back,
    * Cavnar–Trenkle rank weighting). Lists follow the published
    * letter/trigram frequency tables for each language. */
  val Profiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", " an", "and", "nd ", " of", "of ",
      " to", "to ", "ing", "ng ", " in", "in ", "ion", "ed ", " is",
      "is ", "tio", "ent", " be", "er ", "es ", " he", "at ", " re",
      "hat", "his", " it", "it "),
    "de" -> Seq(" de", "der", "er ", "ie ", "die", " un", "und", "nd ",
      "ein", "ung", "ch ", "sch", " ge", "che", "ich", "en ", " di",
      "ne ", "cht", "das", " da", "ist", " mi", "mit", "gen", " is",
      "ten", "ber", " ei", "ine"),
    "fr" -> Seq(" de", "de ", " le", "le ", "ent", "nt ", "et ", " et",
      "la ", " la", "ion", "on ", " pa", "tio", "que", " qu", "ue ",
      "re ", " co", "les", "e d", "e l", "ait", " un", "eur", "des",
      "une", "ur ", "us ", " l'"),
    "es" -> Seq(" de", "de ", "os ", " la", "la ", "el ", " el", " qu",
      "que", "ue ", "en ", " en", " co", "as ", "ión", "ció", "aci",
      " es", "ado", "dos", " se", "nte", "ara", " po", "por", "con",
      " un", "del", "una", "ent"),
    "it" -> Seq(" di", "di ", "re ", " co", "to ", "la ", " la", "ere",
      "no ", "one", "ne ", "che", " ch", "lle", "del", "ell", " pe",
      "per", "zio", "ion", "ni ", " no", "ano", "nte", "ato", " so",
      "gli", " in", "ita", "e d"),
    // Native-script profiles for the script-dispatch languages
    // (VERDICT r11 #8): dispatch fires only above cjkThreshold, so a
    // MIXED-script document (a Cyrillic phrase inside digits/markup, a
    // diluted Devanagari quote) used to fall through to the 5-language
    // Latin vote and come back 'und' — with these the VOTE covers
    // ru/ar/hi too. Same construction as the Latin lists (published
    // letter/trigram frequency tables, boundary-padded, rank-weighted);
    // the scripts are disjoint, so these grams can never perturb a
    // Latin vote. (ja/ko/zh stay dispatch-only: their texts rarely use
    // ASCII spaces, so word-boundary-padded trigrams are the wrong
    // feature — kana/Hangul/Han ratios are the reliable signal.)
    "ru" -> Seq(" не", "не ", " на", "на ", " по", "по ", " пр", "ого",
      "го ", "ени", "ние", "ие ", "ост", "сть", "ть ", "ать", " ко",
      "ово", "ов ", " от", "от ", " ст", "сто", "то ", " то", "но ",
      " и ", "ой ", "ли ", "ия "),
    "ar" -> Seq(" ال", "الم", "الت", "الع", "الا", "لى ", " عل", "على",
      "ية ", " في", "في ", " من", "من ", " وا", "ان ", "ين ", "ون ",
      " لل", "ات ", "ها ", " أن", "أن ", "ما ", " ما", "ة ا", "اء ",
      " با", " لا", "لا ", "الس"),
    "hi" -> Seq(" के", "के ", " का", "का ", " की", "की ", " है", "है ",
      " को", "को ", "में", " मे", "ें ", " ने", "ने ", " से", "से ",
      " पर", "पर ", "ों ", "ता ", "या ", "ार ", "ान ", " हो", "हैं",
      " और", "और ", "ही ", "िया"))

  require(Profiles.forall { case (_, gs) =>
    gs.distinct.length == gs.length && gs.forall(_.length == 3) },
    "profile grams must be unique 3-char strings per language")

  /** The model as a DataFrame (gram, lang, pts) — tiny, broadcast at
    * the join; kept relational so a TRAINED model (see [[train]]) drops
    * in with no code change. */
  def profilesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Profiles.flatMap { case (lang, gs) =>
      gs.zipWithIndex.map { case (g, i) => (g, lang, gs.length - i) }
    }.toDF("gram", "lang", "pts")
  }

  /** Whitespace-normalized, lowercased, space-padded text — the
    * Cavnar–Trenkle boundary padding. Reference formulation; the hot
    * path fuses this into [[gramsOf]] (LangIdSpec pins equality).
    *
    * Caveat (same as duckWords in the Pipeline/Curation probes): Java's
    * `\s` includes `\x0B` (vertical tab) while DuckDB's RE2 `\s` does
    * not — the [[graft.functions.CharGrams]] kernel hard-codes the Java
    * set 0x09-0x0d+space, so a corpus containing vertical tabs would
    * diverge from [[oracleSql]] by that character class alone. */
  def normalize(text: Column): Column =
    concat(lit(" "), regexp_replace(lower(text), "\\s+", " "), lit(" "))

  /** All character n-grams of a (pre-normalized) string — reference
    * formulation (interpreted HOF lambdas; see [[gramsOf]]). */
  def charGrams(t: Column, n: Int = 3): Column =
    transform(sequence(lit(1), greatest(length(t) - (n - 1), lit(1))),
      i => t.substr(i, lit(n)))

  /** `charGrams(normalize(text), n)` as ONE codegen kernel pass
    * ([[graft.functions.CharGrams]]) — the per-gram hot loop of the
    * operator; value-identical to the reference chain. */
  def gramsOf(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graftaccess.Internals.column(
      graft.functions.CharGrams(
        org.apache.spark.sql.graftaccess.Internals.expression(text), n))

  /** Train a profile model from a labeled corpus: per-language gram
    * counts (one hash aggregate with map-side combine), top-`k` per
    * language by a lang-partitioned window on the SAME partitioning,
    * rank points exactly like the built-in lists. The model stays a
    * DataFrame — at web scale nothing is collected. */
  def train(df: DataFrame, langCol: String, textCol: String,
      k: Int = 30, n: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(col("cnt").desc, col("gram"))
    df.select(col(langCol).as("lang"),
        explode(gramsOf(col(textCol), n)).as("gram"))
      .groupBy(col("lang"), col("gram")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("gram"), col("lang"), (lit(k + 1) - col("rk")).as("pts"))
  }

  /** Per-script BMP codepoint ranges for the dispatch ladder — each is
    * spelled identically in Java regex (classify) and RE2 `\x{..}`
    * (oracle). Order matters: kana is checked BEFORE Han so Japanese
    * text (kana + kanji mixed) never lands on `zh`, and Han text with
    * no kana still does. */
  private[operators] val ScriptRanges: Seq[(String, Char, Char)] = Seq(
    ("kana", '\u3040', '\u30ff'), // Hiragana + Katakana
    ("hang", '\uac00', '\ud7a3'), // Hangul syllables
    ("han", '\u4e00', '\u9fff'),  // CJK Unified Ideographs
    ("cyr", '\u0400', '\u04ff'),  // Cyrillic
    ("arab", '\u0600', '\u06ff'), // Arabic
    ("deva", '\u0900', '\u097f')) // Devanagari

  /** Classify each document: (idCol, lang, score[, margin]).
    *
    * `lang` is the argmax-points language (ties broken alphabetically —
    * deterministic cross-engine) with a SCRIPT DISPATCH ladder first,
    * the way production identifiers handle scripts the trigram model
    * cannot see: kana-rich → 'ja' (checked before Han, since Japanese
    * mixes kana with kanji), Hangul → 'ko', Han → 'zh', Cyrillic →
    * 'ru', Arabic → 'ar', Devanagari → 'hi'. Each fires when the
    * script's codepoint count clears `cjkThreshold` × doc length (kana
    * at HALF that — kana is rarely the majority of Japanese text but
    * is near-absent in every other language). Any `cjkThreshold > 1`
    * disables dispatch entirely — including the kana half-rule — and
    * skips the per-script counting passes altogether (the disabled
    * path costs zero). Latin-script text falls through to the
    * trigram vote; `'und'` when no profile gram occurs at all.
    *
    * `score` is the exact integer point sum of the vote (0 when no
    * gram hit). With `margin = true` the output adds the top1−top2
    * vote-score gap — what a curation pipeline actually thresholds on
    * (a confident 'en' beats 'es' by a wide margin; near-ties are the
    * docs to re-check). When exactly ONE language scored the margin
    * equals the score (an uncontested vote is maximally confident);
    * it is 0 only when NO language scored. Script-dispatched rows
    * keep their vote margin (the vote still ran — dispatch only
    * overrides the label). */
  def classify(df: DataFrame, idCol: String, textCol: String,
      model: DataFrame, n: Int = 3, cjkThreshold: Double = 0.3,
      margin: Boolean = false): DataFrame = {
    // Parallelism FIRST (one cheap shuffle of bare id+text), with an
    // EXPLICIT partition count: a by-column repartition is
    // AQE-coalescible, and on a small-bytes/heavy-CPU relation like
    // text AQE squeezes it to ~3 tasks — serializing the regex
    // normalize, the per-char gram explode and the model join, the
    // actual cost of this operator (measured 2.1s → 0.6s at sf0.1).
    // Both downstream branches (gram vote + script metadata) read this
    // ONE exchange — ReusedExchange fires, each branch's projection
    // runs post-shuffle on every core, and the final left join is
    // already co-partitioned by id.
    val nP = OpConf.shufflePartitions(df)
    // null ids are dropped UP FRONT (mirrored in [[oracleSql]]): the id
    // is the key a pipeline joins the labels back on, and the explicit
    // filter makes both branches' exchange subtrees canonicalize
    // identically — the left join below infers isnotnull(id) on the
    // vote side only, which would otherwise split the shared exchange
    // into two full scans + shuffles of the corpus
    val raw = df.select(col(idCol).as("id"), col(textCol).as("__text"))
      .filter(col("id").isNotNull)
      .repartition(nP, col("id"))
    // dispatch is ON iff the threshold is attainable (a ratio is <= 1);
    // a disabled run (q_langid_train's 2.0) must not pay the six
    // per-script regex passes NOR let the half-threshold kana rule
    // fire at 1 < cjkThreshold < 2 (the review-caught contract bug)
    val dispatchOn = cjkThreshold <= 1.0
    // one projection computes every script count (each a codegen'd
    // regexp_replace length-diff over the text; all ranges are BMP so
    // UTF-16 `length` counts codepoints identically here and in DuckDB)
    val base =
      if (!dispatchOn) raw.select(col("id"))
      else raw.select(col("id") +: length(col("__text")).as("__n") +:
        ScriptRanges.map { case (name, lo, hi) =>
          (length(col("__text")) - length(regexp_replace(col("__text"),
            s"[$lo-$hi]", ""))).as(s"__${name}_n")
        }: _*)
    // explode_OUTER, deliberately: plain explode lets Catalyst infer a
    // size(grams)>0 filter and push it BELOW the repartition exchange,
    // making this branch's exchange subtree differ from `base`'s — the
    // documents scan+shuffle then runs TWICE. With the outer variant
    // both branches share one canonical exchange (ReusedExchange) and
    // the inner model join drops the null-gram rows anyway.
    val scored = raw
      .select(col("id"),
        explode_outer(gramsOf(col("__text"), n)).as("gram"))
      .join(broadcast(model), "gram") // drops non-profile grams pre-shuffle
      .groupBy(col("id"), col("lang"))
      .agg(sum(col("pts")).cast("long").as("score"))
    // argmax as ONE struct-min aggregate (score desc, lang asc): no
    // second window, stays in the same hash-aggregate pipeline. The
    // margin variant sorts the (at most #languages) per-doc entries
    // instead — still one bounded aggregate, no window.
    val best =
      if (!margin)
        scored.groupBy(col("id"))
          .agg(min(struct((-col("score")).as("ns"), col("lang").as("lang")))
            .as("__b"))
          .select(col("id"), col("__b.lang").as("lang"),
            (-col("__b.ns")).as("score"))
      else
        scored.groupBy(col("id"))
          .agg(sort_array(collect_list(
            struct((-col("score")).as("ns"), col("lang").as("lang"))))
            .as("__a"))
          .select(col("id"),
            col("__a").getItem(0).getField("lang").as("lang"),
            (-col("__a").getItem(0).getField("ns")).as("score"),
            ((-col("__a").getItem(0).getField("ns")) -
              when(size(col("__a")) > 1,
                -col("__a").getItem(1).getField("ns")).otherwise(lit(0L)))
              .as("margin"))
    val voted = coalesce(col("lang"), lit("und"))
    val t = col("__n") // doc length; thresholds are script_count > f(thr)·n
    val dispatched =
      if (!dispatchOn) voted
      else ScriptRanges.foldLeft(
        when(col(s"__kana_n") > lit(cjkThreshold / 2) * t, lit("ja"))) {
        case (w, ("kana", _, _)) => w // seeded above (half threshold)
        case (w, (name, _, _)) =>
          val lang = Map("hang" -> "ko", "han" -> "zh", "cyr" -> "ru",
            "arab" -> "ar", "deva" -> "hi")(name)
          w.when(col(s"__${name}_n") > lit(cjkThreshold) * t, lit(lang))
      }.otherwise(voted)
    val out = base.join(best, Seq("id"), "left_outer")
    val cols = Seq(col("id").as(idCol), dispatched.as("lang"),
      coalesce(col("score"), lit(0L)).as("score")) ++
      (if (margin) Seq(coalesce(col("margin"), lit(0L)).as("margin"))
       else Nil)
    out.select(cols: _*)
  }

  /** DuckDB replay of [[classify]] with the built-in model for the
    * correctness oracle (identical VALUES literals, same integer
    * arithmetic; the quadratic-free shape matters only at Spark scale).
    * Script counts use the same BMP ranges as [[ScriptRanges]] spelled
    * `\x{..}`; thresholds are CAST AS DOUBLE so both engines compare
    * integer counts against the SAME IEEE product (a bare `0.3` literal
    * would be DECIMAL in DuckDB — exact arithmetic that diverges from
    * Spark's double exactly on boundary docs). `\s` caveat: see
    * [[normalize]] (Java \s ⊃ RE2 \s by \x0B). */
  def oracleSql(table: String, idCol: String, textCol: String,
      cjkThreshold: Double = 0.3): String = {
    val values = Profiles.flatMap { case (lang, gs) =>
      gs.zipWithIndex.map { case (g, i) =>
        s"('${g.replace("'", "''")}', '$lang', ${gs.length - i})"
      }
    }.mkString(", ")
    val dispatchOn = cjkThreshold <= 1.0 // same switch as classify
    val counts =
      if (!dispatchOn) ""
      else ScriptRanges.map { case (name, lo, hi) =>
        val rng = f"[\\x{${lo.toInt}%x}-\\x{${hi.toInt}%x}]"
        s"  length($textCol) - length(regexp_replace($textCol, '$rng', '', 'g')) AS ${name}_n,"
      }.mkString("", "\n", "\n")
    val langCase =
      if (!dispatchOn) "COALESCE(b.lang, 'und')"
      else
        s"""CASE WHEN d.kana_n > CAST(${cjkThreshold / 2} AS DOUBLE) * d.n THEN 'ja'
           |       WHEN d.hang_n > CAST($cjkThreshold AS DOUBLE) * d.n THEN 'ko'
           |       WHEN d.han_n > CAST($cjkThreshold AS DOUBLE) * d.n THEN 'zh'
           |       WHEN d.cyr_n > CAST($cjkThreshold AS DOUBLE) * d.n THEN 'ru'
           |       WHEN d.arab_n > CAST($cjkThreshold AS DOUBLE) * d.n THEN 'ar'
           |       WHEN d.deva_n > CAST($cjkThreshold AS DOUBLE) * d.n THEN 'hi'
           |       ELSE COALESCE(b.lang, 'und') END""".stripMargin
    s"""WITH model(gram, lang, pts) AS (VALUES $values),
       |d AS (SELECT $idCol, ' ' || regexp_replace(lower($textCol), '\\s+', ' ', 'g') || ' ' AS t,
       |$counts  length($textCol) AS n
       |  FROM $table WHERE $idCol IS NOT NULL),
       |g AS (SELECT $idCol, unnest(list_transform(
       |    range(1, greatest(length(t) - 2, 1) + 1),
       |    i -> substr(t, CAST(i AS INT), 3))) AS gram FROM d),
       |s AS (SELECT $idCol, lang, CAST(sum(pts) AS BIGINT) AS score
       |  FROM g JOIN model USING (gram) GROUP BY $idCol, lang),
       |b AS (SELECT $idCol, lang, score FROM s
       |  QUALIFY row_number() OVER (PARTITION BY $idCol
       |    ORDER BY score DESC, lang ASC) = 1)
       |SELECT d.$idCol,
       |  $langCase AS lang,
       |  COALESCE(b.score, 0) AS score
       |FROM d LEFT JOIN b USING ($idCol)
       |ORDER BY $idCol""".stripMargin
  }
}
