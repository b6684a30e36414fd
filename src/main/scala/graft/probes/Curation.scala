package graft.probes

import graft.{Probe, Tables}
import graft.operators.{Boilerplate, Contamination, Fingerprint, GopherRules, Mixing, Pii, Repetition, Sampling, TextAnalysis, Urls}
import org.apache.spark.sql.functions._

/** Data-curation probes (builder-prompt extension surface): repetition
  * metrics, PII redaction, benchmark-contamination detection. Every
  * oracle recomputes the full formula in DuckDB; the PII probe INJECTS
  * deterministic PII (the synthetic corpus has none — an un-planted
  * redaction probe would be vacuously green). */
object Curation {

  // \s caveat: Java's \s includes \x0B, RE2/DuckDB's does not — fine on
  // this \x0B-free ASCII corpus (see the Pipeline.duckWords note).
  private val duckWords =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** DuckDB n-gram list comprehension over a words list `ws` (empty for
    * docs shorter than n words — mirrors Repetition.ngrams). */
  private def duckGrams(n: Int): String =
    if (n == 1) "ws"
    else s"[array_to_string(ws[i:i+${n - 1}], ' ') " +
      s"for i in range(1, greatest(len(ws)-${n - 1}, 0)+1)]"

  /** DuckDB parse of an 8-hex-char string to its BIGINT value — the
    * md5-slice recipe (instr-based digit parse, as in q_dedup_simhash). */
  private def duckHex8(s: String): String =
    s"CAST(list_sum(list_transform(range(8), k -> " +
      s"CAST(instr('0123456789abcdef', substr($s, CAST(k AS INT)+1, 1)) - 1 " +
      s"AS BIGINT) << CAST(4*(7-k) AS BIGINT))) AS BIGINT)"

  private def duckDupFrac(glist: String): String =
    s"CASE WHEN len($glist) > 0 THEN " +
      s"1.0 - len(list_distinct($glist))::DOUBLE / len($glist) " +
      "ELSE 0.0 END"

  val probes: Seq[Probe] = Seq(

    // Repetition profile: projection-only dup fractions + the relational
    // top-bigram share (explode -> per-(doc,gram) count -> per-doc max)
    Probe.df("q_repetition",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |l AS (SELECT doc_id, ws, ${duckGrams(2)} AS g2, ${duckGrams(3)} AS g3
         |      FROM w),
         |d AS (SELECT doc_id,
         |        ${duckDupFrac("ws")} AS dup_word_frac,
         |        ${duckDupFrac("g2")} AS dup_2gram_frac,
         |        ${duckDupFrac("g3")} AS dup_3gram_frac
         |      FROM l),
         |t AS (SELECT doc_id, unnest(g2) AS gram FROM l),
         |c AS (SELECT doc_id, gram, count(*) AS cnt FROM t
         |      GROUP BY doc_id, gram),
         |tops AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
         |           max(cnt) AS top_cnt
         |         FROM c GROUP BY doc_id)
         |SELECT d.doc_id, dup_word_frac, dup_2gram_frac, dup_3gram_frac,
         |  n_grams, top_cnt, top_cnt::DOUBLE / n_grams AS top_frac
         |FROM d JOIN tops ON d.doc_id = tops.doc_id
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Repetition.dupStats(d, "doc_id", "text")
        .join(Repetition.topNgramShare(d, "doc_id", "text", 2)
          .withColumnRenamed("id", "doc_id"), "doc_id")
        .orderBy("doc_id")
    },

    // PII scrub over deterministically planted PII: per-category counts
    // (email/ssn/phone/ipv4) + the redacted text itself. Patterns are
    // Java-regex/RE2-portable; DuckDB regexp_replace needs 'g'. The
    // planted email is MIXED CASE ('Doc…@Example.COM') to pin the
    // case-insensitive classes — a lowercase-only pattern silently
    // misses it (ADVICE r4).
    Probe.df("q_pii_redact",
      """WITH t AS (SELECT doc_id,
        |  text || ' contact Doc' || CAST(doc_id AS VARCHAR)
        |       || '@Example.COM or 555-'
        |       || lpad(CAST(doc_id AS VARCHAR), 3, '0')
        |       || '-1234 ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |       || '.7' AS txt
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(txt,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(txt,
        |    '\d{3}-\d{2}-\d{4}')) AS INT) AS n_ssn,
        |  CAST(len(regexp_extract_all(txt,
        |    '\d{3}-\d{3}-\d{4}')) AS INT) AS n_phone,
        |  CAST(len(regexp_extract_all(txt,
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}')) AS INT) AS n_ipv4,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(txt,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    '\d{3}-\d{2}-\d{4}', '<SSN>', 'g'),
        |    '\d{3}-\d{3}-\d{4}', '<PHONE>', 'g'),
        |    '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}', '<IP>', 'g') AS redacted
        |FROM t ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val injected = Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(
          col("text"), lit(" contact Doc"), col("doc_id").cast("string"),
          lit("@Example.COM or 555-"),
          lpad(col("doc_id").cast("string"), 3, "0"),
          lit("-1234 ip 10.0."), (col("doc_id") % 256).cast("string"),
          lit(".7")).as("text"))
      Pii.scrub(injected, "doc_id", "text").orderBy("doc_id")
    },

    // Benchmark contamination: docs 0-49 play the eval suite; flag any
    // other document sharing a verbatim 8-gram, with the shared-gram
    // count. Spark joins on xxhash64(gram) (8-byte shuffle keys); the
    // oracle joins on the gram strings — identical output unless a
    // 2^-64 collision fires, which the probe would catch.
    Probe.df("q_contamination",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |g AS (SELECT doc_id, unnest(list_distinct(${duckGrams(8)})) AS gram
         |      FROM w),
         |bench AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50)
         |SELECT g.doc_id, count(*) AS n_shared
         |FROM g JOIN bench USING (gram)
         |WHERE g.doc_id >= 50
         |GROUP BY g.doc_id
         |ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      Contamination.overlap(
          d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
          "doc_id", "text", 8)
        .select(col("id").as("doc_id"), col("n_shared"))
        .orderBy("doc_id")
    },

    // Temperature-scaled source mixing (α=0.5, 200-doc budget): the
    // oracle replays counts → quantized sqrt weights → floor-divided
    // takes → md5-ranked selection. Exact cross-engine because weights
    // quantize to int64 and sqrt is correctly rounded (see Mixing).
    Probe.df("q_mix_temperature",
      Mixing.exactMixOracleSql("documents", "doc_id", "source", 200)) {
      (s, dir) =>
      Mixing.exactMix(Tables.load(s, dir, "documents"),
          "doc_id", "source", 0.5, 200)
        .orderBy("doc_id")
    },

    // Loss-driven multiplicative-weights domain reweighting (the DoReMi
    // shape with hashable (1 + η·excess) updates): per-domain excess
    // from the exact integer LM signal, 5 unrolled rounds, domain-name-
    // ordered normalization folds — bit-identical cross-engine.
    Probe.df("q_mix_reweight",
      Mixing.domainReweightOracleSql("documents", "doc_id", "source")) {
      (s, dir) =>
      Mixing.domainReweight(Tables.load(s, dir, "documents"),
          "doc_id", "text", "source")
        .orderBy("domain")
    },

    // END-TO-END curation composition over the round-5 operators:
    // planted multi-line docs → C4 line-level boilerplate removal →
    // Gopher quality gate → weighted priority sample of the survivors.
    // ONE oracle replays every stage, so drift anywhere breaks the hash
    // (the curation-side companion of q_pipeline_e2e).
    Probe.df("q_pipeline_curation",
      "WITH d AS (SELECT doc_id,\n" +
        "  concat(CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter today'\n" +
        "              ELSE concat('unique header ', CAST(doc_id AS VARCHAR)) END,\n" +
        "         chr(10), text) AS text\n" +
        "  FROM documents),\n" +
        Boilerplate.oracleSql("d", "doc_id", 3) + ",\n" +
        "c AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text\n" +
        "      FROM k GROUP BY doc_id),\n" +
        GopherRules.oracleSql("c", "doc_id", 20, 100000) + ",\n" +
        "sel AS (SELECT doc_id, CAST(n_words AS INT) AS n_words FROM g WHERE keep)\n" +
        "SELECT doc_id, n_words,\n" +
        s"  ${Sampling.priorityOracleExpr("doc_id", "n_words")} AS priority\n" +
        "FROM sel ORDER BY priority DESC, doc_id LIMIT 100") { (s, dir) =>
      val planted = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter today"))
            .otherwise(concat(lit("unique header "), col("doc_id").cast("string"))),
          lit("\n"), col("text")).as("text"))
      val clean = Boilerplate.dedupLines(planted, "doc_id", "text", 3)
        .withColumnRenamed("clean_text", "text")
      val kept = GopherRules.qualityFlags(clean, "doc_id", "text",
          minWords = 20)
        .where(col("keep"))
        .select(col("doc_id"), col("n_words"))
      Sampling.prioritySample(kept, "doc_id", "n_words", 100)
        .select("doc_id", "n_words", "priority")
        .orderBy(col("priority").desc, col("doc_id"))
    },

    // Gopher quality rules (Rae et al. 2021 A1.1) — per-doc metric
    // battery + keep flag; minWords lowered to 20 so the synthetic
    // corpus (10–100-word docs) splits both ways. Every ratio is one
    // IEEE division of integer counts — bit-exact cross-engine.
    Probe.df("q_gopher_filter",
      s"""WITH ${GopherRules.oracleSql("documents", "doc_id", 20, 100000)}
         |SELECT doc_id, CAST(n_words AS INT) AS n_words, mean_word_len,
         |  symbol_ratio, alpha_frac, CAST(stop_hits AS INT) AS stop_hits,
         |  keep
         |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      GopherRules.qualityFlags(Tables.load(s, dir, "documents"),
          "doc_id", "text", minWords = 20)
        .orderBy("doc_id")
    },

    // C4-style blocklist word filter: distinct doc words broadcast-semi
    // against the needle list, one aggregate, keep = no hits. Needle
    // 'nosuchword' never matches (the unmatched-needle case rides the
    // same plan). Pure set/count semantics — exact everywhere.
    Probe.df("q_blocklist",
      TextAnalysis.blocklistOracleSql("documents", "doc_id", "text",
        Seq("slow", "big", "nosuchword"))) { (s, dir) =>
      TextAnalysis.blocklistFilter(Tables.load(s, dir, "documents"),
          "doc_id", "text", Seq("slow", "big", "nosuchword"))
        .orderBy("doc_id")
    },

    // Sentence-boundary RAG chunking (planted multi-sentence docs — the
    // corpus text has no terminators): greedy sentence packing at 60
    // words; 10-100-word sentences exercise the one-per-chunk overflow
    // path and multi-sentence chunks. The oracle replays the regex
    // split, word counts, the greedy fold (recursive CTE) and the
    // ordered per-chunk regroup.
    Probe.df("q_text_sentence_chunks",
      TextAnalysis.sentenceChunksOracleSql(
        "documents", "doc_id", "text || '. ' || text || '! ' || text || '?'",
        maxWords = 60)) { (s, dir) =>
      TextAnalysis.sentenceChunks(
          Tables.load(s, dir, "documents").select(col("doc_id"),
            concat(col("text"), lit(". "), col("text"), lit("! "),
              col("text"), lit("?")).as("text")),
          "doc_id", "text", maxWords = 60)
        .orderBy("doc_id", "chunk")
    },

    // C4-style line-level boilerplate removal (planted multi-line docs —
    // the corpus text is single-line): corpus-frequent lines drop, each
    // doc rebuilds from surviving lines in original order. The oracle
    // replays explode → distinct-doc count → membership join → ordered
    // string_agg.
    Probe.df("q_boilerplate_lines",
      s"""WITH d AS (SELECT doc_id,
         |  concat(
         |    CASE WHEN doc_id % 2 = 0 THEN 'subscribe to our newsletter today'
         |         ELSE concat('unique header ', CAST(doc_id AS VARCHAR)) END,
         |    chr(10), text,
         |    CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'follow us on twitter'
         |         ELSE '' END) AS text
         |  FROM documents),
         |${Boilerplate.oracleSql("d", "doc_id", 3)}
         |SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean_text
         |FROM k GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("subscribe to our newsletter today"))
            .otherwise(concat(lit("unique header "), col("doc_id").cast("string"))),
          lit("\n"), col("text"),
          when(col("doc_id") % 5 === 0, lit("\nfollow us on twitter"))
            .otherwise(lit(""))).as("text"))
      Boilerplate.dedupLines(planted, "doc_id", "text", 3)
        .orderBy("doc_id")
    },

    // URL canonicalization (planted URLs — documents carry none):
    // case/port/fragment/tracking-param/param-order variants collapse to
    // one canonical form; the oracle replays every regex/sort step.
    Probe.df("q_url_normalize",
      s"""WITH u AS (SELECT doc_id,
         |  concat(
         |    CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.Example'
         |         ELSE 'https://Sub.Example' END,
         |    CAST(doc_id % 5 AS VARCHAR), '.COM',
         |    CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END,
         |    '/Path/', CAST(doc_id % 7 AS VARCHAR),
         |    CASE WHEN doc_id % 3 = 0 THEN ''
         |         ELSE concat('?utm_source=feed&b=',
         |                     CAST(doc_id % 3 AS VARCHAR), '&a=1') END,
         |    '#sec') AS url
         |  FROM documents)
         |SELECT doc_id, url,
         |  ${Urls.normalizeOracleExpr("url")} AS norm
         |FROM u ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select(col("doc_id"))
      val url = concat(
        when(col("doc_id") % 2 === 0, lit("HTTP://WWW.Example"))
          .otherwise(lit("https://Sub.Example")),
        (col("doc_id") % 5).cast("string"), lit(".COM"),
        when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")),
        lit("/Path/"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 3 === 0, lit("")).otherwise(
          concat(lit("?utm_source=feed&b="),
            (col("doc_id") % 3).cast("string"), lit("&a=1"))),
        lit("#sec"))
      d.select(col("doc_id"), url.as("url"),
          Urls.normalizeUrl(url).as("norm"))
        .orderBy("doc_id")
    },

    // Per-domain cap (Urls.capPerDomain): planted URLs collapse to 7
    // hosts via Urls.host (www/case/port/scheme variants — one site,
    // one key), then at most 20 docs survive per host in deterministic
    // md5 order — the C4/CommonCrawl per-site contribution bound. The
    // oracle replays host extraction AND the ranked selection.
    Probe.df("q_domain_cap",
      s"""WITH u AS (SELECT doc_id,
         |  concat(
         |    CASE WHEN doc_id % 2 = 0 THEN 'HTTP://WWW.Site'
         |         ELSE 'https://site' END,
         |    CAST(doc_id % 7 AS VARCHAR), '.Example.COM',
         |    CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END,
         |    '/page/', CAST(doc_id AS VARCHAR)) AS url
         |  FROM documents),
         |h AS (SELECT doc_id, url,
         |  ${Urls.hostOracleExpr("url")} AS domain FROM u)
         |SELECT doc_id, url, domain, CAST(rn AS INT) AS rn FROM (
         |  SELECT doc_id, url, domain, row_number() OVER (
         |    PARTITION BY domain
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         |  FROM h) t
         |WHERE rn <= 20
         |ORDER BY domain, rn""".stripMargin) { (s, dir) =>
      val u = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(
          when(col("doc_id") % 2 === 0, lit("HTTP://WWW.Site"))
            .otherwise(lit("https://site")),
          (col("doc_id") % 7).cast("string"), lit(".Example.COM"),
          when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit("")),
          lit("/page/"), col("doc_id").cast("string")).as("url"))
      Urls.capPerDomain(u, "url", "doc_id", 20)
        .select("doc_id", "url", "domain", "rn")
        .orderBy("domain", "rn")
    },

    // Winnowing fingerprints (MOSS): the oracle replays the rolling
    // Rabin–Karp + window-minima integer math per document — the full
    // fingerprint SETS are hash-compared, not just counts. Comma-joined
    // to a scalar (driver's pandas row-sorter cannot sort array cells);
    // FingerprintSpec covers the typed arrays.
    Probe.df("q_fingerprint_winnow",
      "SELECT doc_id, array_to_string(fps, ',') AS fps FROM (" +
        Fingerprint.fingerprintsOracleSql("documents", "doc_id", "text") +
        ") ORDER BY doc_id") { (s, dir) =>
      Fingerprint.fingerprints(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .withColumn("fps", array_join(col("fps").cast("array<string>"), ","))
        .orderBy("doc_id")
    },

    // Fingerprint-overlap copy detection: self-join on the winnowed
    // fingerprint (the blocking key), Jaccard >= 0.5 over the fp sets.
    // Recovers exactly the corpus's 25 planted near-dup pairs (the same
    // truth set q_dedup_minhash finds; next-highest pair sits at 0.17).
    Probe.df("q_fingerprint_overlap",
      Fingerprint.overlapOracleSql("documents", "doc_id", "text")) {
      (s, dir) =>
      Fingerprint.overlapPairs(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .select(col("d1"), col("d2"), col("shared"),
          col("m1").cast("bigint").as("m1"),
          col("m2").cast("bigint").as("m2"), col("jac"))
        .orderBy("d1", "d2")
    },

    // Band-of-2 blocking variant — the scale path for low-entropy
    // corpora where single-fingerprint buckets go ubiquitous (this IS
    // the benched one; see BASELINE.md). Oracle replays candidate
    // generation AND the set-intersection verify.
    Probe.df("q_fingerprint_overlap_banded",
      Fingerprint.overlapBandedOracleSql("documents", "doc_id", "text")) {
      (s, dir) =>
      Fingerprint.overlapPairsBanded(Tables.load(s, dir, "documents"),
          "doc_id", "text")
        .orderBy("d1", "d2")
    },

    // Bigram-LM self-scoring (operators/LmScore) — the CCNet-style
    // perplexity-filter shape. Hash-checked column is sum_qp, the
    // quantized-int64 accumulation of the interpolated probability
    // (every step correctly-rounded IEEE on identical operands —
    // FIXTURES recipe); avg_logp (ln-based) is engine-local and stays
    // out of the probe (LmScoreSpec covers it).
    Probe.df("q_lm_score",
      "WITH " +
        graft.operators.LmScore.selfScoreCtes("documents", "doc_id") + "\n" +
        """SELECT doc_id, nb AS n_bigrams, sq AS sum_qp FROM sc
          |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.LmScore.selfScore(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("sum_qp"))
        .orderBy("doc_id")
    },

    // CCNet-style per-language perplexity bucketing (Wenzek LREC '20):
    // rank by the EXACT integer mean quantized bigram probability,
    // split head/middle/tail by multiply-compare thirds; unscorable
    // docs (< 2 tokens) sink to the tail at avg_q = -1.
    Probe.df("q_lm_ppl_buckets",
      graft.operators.LmScore.perplexityBucketsOracleSql(
        "documents", "doc_id", "lang")) { (s, dir) =>
      graft.operators.LmScore.perplexityBuckets(
          Tables.load(s, dir, "documents"), "doc_id", "text", "lang")
        .orderBy("lang", "rank")
    },

    // The SCALE TIER of the bucketing: value-histogram cuts + within-
    // value ranks instead of a whole-language sort — bit-identical
    // output, so the SAME oracle applies.
    Probe.df("q_lm_ppl_buckets_hist",
      graft.operators.LmScore.perplexityBucketsOracleSql(
        "documents", "doc_id", "lang")) { (s, dir) =>
      graft.operators.LmScore.perplexityBucketsHist(
          Tables.load(s, dir, "documents"), "doc_id", "text", "lang")
        .orderBy("lang", "rank")
    },

    // Trigram-LM self-scoring: the deeper interpolated tier
    // (0.7·trigram + 0.2·bigram + 0.1·Laplace-unigram). Same
    // quantized-int64 recipe; docs shorter than 3 tokens drop out.
    Probe.df("q_lm_score_tri",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |toks AS (SELECT doc_id, unnest(ws) AS w FROM w),
         |uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY w),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_tokens,
         |               count(*) AS vocab FROM uni),
         |bg AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM w WHERE len(ws) >= 2),
         |bi AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS cb
         |       FROM bg GROUP BY 1, 2),
         |tg AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1],
         |     'w3': ws[CAST(i AS INT)+2]}
         |    for i in range(1, len(ws) - 1) ]) AS s
         |  FROM w WHERE len(ws) >= 3),
         |tge AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2, s.w3 AS w3 FROM tg),
         |tri AS (SELECT w1, w2, w3, count(*) AS ct FROM tge GROUP BY 1, 2, 3),
         |p AS (SELECT tge.doc_id,
         |    CAST(0.7 AS DOUBLE) * (coalesce(tri.ct, 0)::DOUBLE
         |      / greatest(coalesce(bh.cb, 1), 1)::DOUBLE)
         |  + CAST(0.2 AS DOUBLE) * (coalesce(b23.cb, 0)::DOUBLE
         |      / greatest(coalesce(u2.cu, 1), 1)::DOUBLE)
         |  + CAST(0.1 AS DOUBLE) * ((coalesce(u3.cu, 0) + 1)::DOUBLE
         |      / (tot.n_tokens + tot.vocab)::DOUBLE) AS p
         |  FROM tge LEFT JOIN tri USING (w1, w2, w3)
         |           LEFT JOIN bi bh ON bh.w1 = tge.w1 AND bh.w2 = tge.w2
         |           LEFT JOIN bi b23 ON b23.w1 = tge.w2 AND b23.w2 = tge.w3
         |           LEFT JOIN uni u2 ON u2.w = tge.w2
         |           LEFT JOIN uni u3 ON u3.w = tge.w3, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |  CAST(sum(CAST(floor(p * 1073741824) AS BIGINT)) AS BIGINT)
         |    AS sum_qp
         |FROM p GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.LmScore.selfScoreTrigram(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_trigrams"), col("sum_qp"))
        .orderBy("doc_id")
    },

    // Interpolated Kneser–Ney bigram self-scoring (D = 0.75): the
    // KenLM-style smoothing tier — discounted bigram MLE plus
    // continuation-unigram backoff (distinct-context counts, not raw
    // frequencies). Same quantized-int64 hash recipe: D = 3/4 is an
    // exact binary fraction, every division/product is one
    // correctly-rounded IEEE op on identical operands.
    Probe.df("q_lm_score_kn",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |bg AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM w WHERE len(ws) >= 2),
         |bge AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
         |bi AS (SELECT w1, w2, count(*) AS cb FROM bge GROUP BY 1, 2),
         |pre AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS c1,
         |               count(*) AS nfollow FROM bi GROUP BY w1),
         |cont AS (SELECT w2, count(*) AS nprec FROM bi GROUP BY w2),
         |typ AS (SELECT count(*) AS ntypes FROM bi),
         |p AS (SELECT bge.doc_id,
         |    ((bi.cb::DOUBLE - CAST(0.75 AS DOUBLE)) / pre.c1::DOUBLE)
         |  + ((CAST(0.75 AS DOUBLE) * pre.nfollow::DOUBLE) / pre.c1::DOUBLE)
         |    * (cont.nprec::DOUBLE / typ.ntypes::DOUBLE) AS p
         |  FROM bge JOIN bi USING (w1, w2)
         |           JOIN pre USING (w1)
         |           JOIN cont USING (w2), typ)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CAST(floor(p * 1073741824) AS BIGINT)) AS BIGINT)
         |    AS sum_qp
         |FROM p GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.LmScore.selfScoreKneserNey(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"), col("sum_qp"))
        .orderBy("doc_id")
    },

    // Cross-corpus LM scoring: model trained on the EVEN doc_ids, odd
    // docs scored against it — the held-out-LM shape real pipelines use
    // (unseen words exercise the Laplace floor). Same quantized-int64
    // hash-exact recipe as q_lm_score.
    Probe.df("q_lm_score_cross",
      s"""WITH w0 AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |wtr AS (SELECT * FROM w0 WHERE doc_id % 2 = 0),
         |wte AS (SELECT * FROM w0 WHERE doc_id % 2 = 1),
         |toks AS (SELECT doc_id, unnest(ws) AS w FROM wtr),
         |uni AS (SELECT w, count(*) AS cu FROM toks GROUP BY w),
         |tot AS (SELECT CAST(sum(cu) AS BIGINT) AS n_tokens,
         |               count(*) AS vocab FROM uni),
         |bgt AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM wtr WHERE len(ws) >= 2),
         |bi AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS cb
         |       FROM bgt GROUP BY 1, 2),
         |bg AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM wte WHERE len(ws) >= 2),
         |bge AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
         |p AS (SELECT bge.doc_id,
         |    CAST(0.9 AS DOUBLE) * (coalesce(bi.cb, 0)::DOUBLE
         |      / greatest(coalesce(u1.cu, 1), 1)::DOUBLE)
         |  + CAST(0.1 AS DOUBLE) * ((coalesce(u2.cu, 0) + 1)::DOUBLE
         |      / (tot.n_tokens + tot.vocab)::DOUBLE) AS p
         |  FROM bge LEFT JOIN bi USING (w1, w2)
         |           LEFT JOIN uni u1 ON u1.w = bge.w1
         |           LEFT JOIN uni u2 ON u2.w = bge.w2, tot)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CAST(floor(p * 1073741824) AS BIGINT)) AS BIGINT)
         |    AS sum_qp
         |FROM p GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      val (uni, bi, tot) = graft.operators.LmScore.bigramModel(
        docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
      graft.operators.LmScore.score(
          docs.where(col("doc_id") % 2 === 1), "doc_id", "text",
          uni, bi, tot)
        .select(col("doc_id"), col("n_bigrams"), col("sum_qp"))
        .orderBy("doc_id")
    },

    // DSIR-shaped importance selection: target LM on even docs, source
    // LM on odd docs, every doc scored under both, top-50 kept by the
    // quantized-probability margin (difference of two exact int64s —
    // hash-exact; the ln-based DSIR weight is emitted for use and
    // spec-checked, not hashed). Oracle replays BOTH models and the
    // deterministic (margin DESC, doc_id) selection.
    Probe.df("q_dsir_select",
      s"""WITH w0 AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |wt AS (SELECT * FROM w0 WHERE doc_id % 2 = 0),
         |wsrc AS (SELECT * FROM w0 WHERE doc_id % 2 = 1),
         |tt AS (SELECT doc_id, unnest(ws) AS w FROM wt),
         |uni_t AS (SELECT w, count(*) AS cu FROM tt GROUP BY w),
         |tot_t AS (SELECT CAST(sum(cu) AS BIGINT) AS n_tokens,
         |                 count(*) AS vocab FROM uni_t),
         |bgt AS (SELECT unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM wt WHERE len(ws) >= 2),
         |bi_t AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS cb
         |         FROM bgt GROUP BY 1, 2),
         |ts AS (SELECT doc_id, unnest(ws) AS w FROM wsrc),
         |uni_s AS (SELECT w, count(*) AS cu FROM ts GROUP BY w),
         |tot_s AS (SELECT CAST(sum(cu) AS BIGINT) AS n_tokens,
         |                 count(*) AS vocab FROM uni_s),
         |bgs AS (SELECT unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM wsrc WHERE len(ws) >= 2),
         |bi_s AS (SELECT s.w1 AS w1, s.w2 AS w2, count(*) AS cb
         |         FROM bgs GROUP BY 1, 2),
         |bg AS (SELECT doc_id, unnest(
         |  [ {'w1': ws[CAST(i AS INT)], 'w2': ws[CAST(i AS INT)+1]}
         |    for i in range(1, len(ws)) ]) AS s
         |  FROM w0 WHERE len(ws) >= 2),
         |bge AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM bg),
         |p_t AS (SELECT bge.doc_id,
         |    CAST(0.9 AS DOUBLE) * (coalesce(bi_t.cb, 0)::DOUBLE
         |      / greatest(coalesce(u1.cu, 1), 1)::DOUBLE)
         |  + CAST(0.1 AS DOUBLE) * ((coalesce(u2.cu, 0) + 1)::DOUBLE
         |      / (tot_t.n_tokens + tot_t.vocab)::DOUBLE) AS p
         |  FROM bge LEFT JOIN bi_t USING (w1, w2)
         |           LEFT JOIN uni_t u1 ON u1.w = bge.w1
         |           LEFT JOIN uni_t u2 ON u2.w = bge.w2, tot_t),
         |st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(CAST(floor(p * 1073741824) AS BIGINT)) AS BIGINT)
         |    AS sum_qp_target
         |  FROM p_t GROUP BY doc_id),
         |p_s AS (SELECT bge.doc_id,
         |    CAST(0.9 AS DOUBLE) * (coalesce(bi_s.cb, 0)::DOUBLE
         |      / greatest(coalesce(u1.cu, 1), 1)::DOUBLE)
         |  + CAST(0.1 AS DOUBLE) * ((coalesce(u2.cu, 0) + 1)::DOUBLE
         |      / (tot_s.n_tokens + tot_s.vocab)::DOUBLE) AS p
         |  FROM bge LEFT JOIN bi_s USING (w1, w2)
         |           LEFT JOIN uni_s u1 ON u1.w = bge.w1
         |           LEFT JOIN uni_s u2 ON u2.w = bge.w2, tot_s),
         |ss AS (SELECT doc_id,
         |  CAST(sum(CAST(floor(p * 1073741824) AS BIGINT)) AS BIGINT)
         |    AS sum_qp_source
         |  FROM p_s GROUP BY doc_id)
         |SELECT st.doc_id, st.n_bigrams, st.sum_qp_target, ss.sum_qp_source,
         |  st.sum_qp_target - ss.sum_qp_source AS margin
         |FROM st JOIN ss USING (doc_id)
         |ORDER BY margin DESC, doc_id
         |LIMIT 50""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.operators.LmScore.importanceSelect(docs, "doc_id", "text",
          target = docs.where(col("doc_id") % 2 === 0),
          source = docs.where(col("doc_id") % 2 === 1), k = 50)
        .select(col("doc_id"), col("n_bigrams"),
          col("sum_qp_target"), col("sum_qp_source"), col("margin"))
    },

    // Language ID (operators/LangId): Cavnar–Trenkle char-trigram rank
    // points, integer end-to-end, so the oracle replays the model
    // VALUES and every score hash-exactly. The synthetic corpus is
    // uniform word-salad (its `lang` column is a label, not a property
    // of the text) — real-language discrimination is pinned by
    // LangIdSpec on natural-language sentences; this probe pins the
    // distributed mechanism: gram explode, model join, integer vote,
    // deterministic argmax, script/und dispatch.
    Probe.df("q_langid",
      graft.operators.LangId.oracleSql("documents", "doc_id", "text")) {
      (s, dir) =>
        graft.operators.LangId.classify(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            graft.operators.LangId.profilesDf(s))
          .orderBy("doc_id")
    },

    // The TRAIN path: learn top-k trigram profiles from the corpus
    // labeled by its `lang` column (counts → per-lang rank window →
    // integer points), then classify with the LEARNED model AND the
    // confidence margin (top1−top2 vote score — what a curation
    // pipeline actually thresholds on) — the end-to-end Cavnar–Trenkle
    // loop, fully replayed in DuckDB. Margin via lead() over the
    // per-doc score ranking; 0 when fewer than two languages scored.
    Probe.df("q_langid_train",
      """WITH d AS (SELECT lang, doc_id,
        |    ' ' || regexp_replace(lower(text), '\s+', ' ', 'g') || ' ' AS t
        |  FROM documents),
        |g AS (SELECT lang, doc_id, unnest(list_transform(
        |    range(1, greatest(length(t) - 2, 1) + 1),
        |    i -> substr(t, CAST(i AS INT), 3))) AS gram FROM d),
        |c AS (SELECT lang, gram, count(*) AS cnt FROM g GROUP BY 1, 2),
        |m AS (SELECT gram, lang, CAST(41 - rk AS BIGINT) AS pts FROM (
        |    SELECT lang, gram, row_number() OVER (PARTITION BY lang
        |      ORDER BY cnt DESC, gram ASC) AS rk FROM c)
        |  WHERE rk <= 40),
        |s AS (SELECT doc_id, m.lang AS lang,
        |    CAST(sum(pts) AS BIGINT) AS score
        |  FROM g JOIN m USING (gram) GROUP BY 1, 2),
        |b AS (SELECT doc_id, lang, score,
        |    score - COALESCE(lead(score) OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, lang ASC), 0) AS margin
        |  FROM s
        |  QUALIFY row_number() OVER (PARTITION BY doc_id
        |    ORDER BY score DESC, lang ASC) = 1)
        |SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang,
        |  COALESCE(b.score, 0) AS score,
        |  COALESCE(b.margin, 0) AS margin
        |FROM d LEFT JOIN b USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = Tables.load(s, dir, "documents")
      graft.operators.LangId.classify(docs, "doc_id", "text",
          graft.operators.LangId.train(docs, "lang", "text", k = 40),
          cjkThreshold = 2.0, // no script dispatch: pure learned vote
          margin = true)
        .orderBy("doc_id")
    },

    // Trained quality classifier (operators/QualityClassifier): hashed
    // word features + 3 FULL-BATCH perceptron sweeps from zero weights,
    // then the whole corpus scored on the learned margin — the
    // fastText-shaped CCNet/LLaMA quality gate, INTEGER end-to-end so
    // the oracle replays training AND scoring hash-exactly (no
    // sigmoid/exp anywhere). Labels are planted (y = doc_id%3=0) with a
    // spam-token signal; every 7th negative gets one shared spam token
    // so the later sweeps have real false positives to subtract.
    Probe.df("q_quality_classifier",
      """WITH planted AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |        THEN ' freeoffer winbig bonusx bonusx'
        |        ELSE CASE WHEN doc_id % 7 = 1 THEN ' bonusx' ELSE '' END
        |      END AS text
        |  FROM documents),
        |""".stripMargin +
        graft.operators.QualityClassifier.oracleSql("planted", "doc_id",
          "text", "doc_id % 3 = 0").stripPrefix("WITH ")) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" freeoffer winbig bonusx bonusx"))
            .otherwise(when(col("doc_id") % 7 === 1, lit(" bonusx"))
              .otherwise(lit("")))).as("text"),
        (col("doc_id") % 3 === 0).cast("int").as("y"))
      val model = graft.operators.QualityClassifier.train(
        planted, "doc_id", "text", "y")
      graft.operators.QualityClassifier.score(planted, "doc_id", "text", model)
        .join(planted.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("y"), col("margin"), col("pred"))
        .orderBy("doc_id")
    },

    // The TRANSFER shape — the way the gate actually runs in
    // production: the model trains on a labeled SEED subset (the even
    // doc_ids) and scores the ENTIRE corpus, held-out docs included.
    // Same planted signal; the oracle's sweeps read only the ftr
    // (train-subset) features while the final margin covers every doc.
    Probe.df("q_quality_transfer",
      """WITH planted AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |        THEN ' freeoffer winbig bonusx bonusx'
        |        ELSE CASE WHEN doc_id % 7 = 1 THEN ' bonusx' ELSE '' END
        |      END AS text
        |  FROM documents),
        |""".stripMargin +
        graft.operators.QualityClassifier.oracleSql("planted", "doc_id",
          "text", "doc_id % 3 = 0", trainWhere = "id % 2 = 0")
          .stripPrefix("WITH ")) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" freeoffer winbig bonusx bonusx"))
            .otherwise(when(col("doc_id") % 7 === 1, lit(" bonusx"))
              .otherwise(lit("")))).as("text"),
        (col("doc_id") % 3 === 0).cast("int").as("y"))
      val model = graft.operators.QualityClassifier.train(
        planted.filter(col("doc_id") % 2 === 0), "doc_id", "text", "y")
      graft.operators.QualityClassifier.score(planted, "doc_id", "text", model)
        .join(planted.select(col("doc_id"), col("y")), "doc_id")
        .select(col("doc_id"), col("y"), col("margin"), col("pred"))
        .orderBy("doc_id")
    },

    // Margin-threshold calibration (QualityClassifier.prCurve): the
    // precision/recall curve a pipeline reads to pick the cut. One row
    // per distinct margin; tp/fp accumulate via the distributed
    // two-pass cumsum (never a single-task global window); the oracle
    // replays the whole chain — classifier training included (nested
    // WITH) — with a plain windowed cumsum. "prec" not "precision":
    // PRECISION is a reserved word in DuckDB.
    Probe.df("q_quality_pr",
      """WITH planted AS (SELECT doc_id,
        |    text || CASE WHEN doc_id % 3 = 0
        |        THEN ' freeoffer winbig bonusx bonusx'
        |        ELSE CASE WHEN doc_id % 7 = 1 THEN ' bonusx' ELSE '' END
        |      END AS text
        |  FROM documents),
        |scored AS (
        |""".stripMargin +
        graft.operators.QualityClassifier.oracleSql("planted", "doc_id",
          "text", "doc_id % 3 = 0") +
        """
        |),
        |s AS (SELECT margin AS threshold, CAST(sum(y) AS BIGINT) AS pos,
        |    CAST(count(*) - sum(y) AS BIGINT) AS neg
        |  FROM scored GROUP BY margin),
        |t AS (SELECT CAST(sum(y) AS BIGINT) AS tot FROM scored),
        |c AS (SELECT threshold,
        |    CAST(sum(pos) OVER (ORDER BY threshold DESC) AS BIGINT) AS tp,
        |    CAST(sum(neg) OVER (ORDER BY threshold DESC) AS BIGINT) AS fp
        |  FROM s)
        |SELECT threshold, tp, fp,
        |  tp::DOUBLE / (tp + fp)::DOUBLE AS prec,
        |  tp::DOUBLE / t.tot::DOUBLE AS recall
        |FROM c, t
        |ORDER BY threshold DESC""".stripMargin) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents").select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" freeoffer winbig bonusx bonusx"))
            .otherwise(when(col("doc_id") % 7 === 1, lit(" bonusx"))
              .otherwise(lit("")))).as("text"),
        (col("doc_id") % 3 === 0).cast("int").as("y"))
      val model = graft.operators.QualityClassifier.train(
        planted, "doc_id", "text", "y")
      val scored = graft.operators.QualityClassifier
        .score(planted, "doc_id", "text", model)
        .join(planted.select(col("doc_id"), col("y")), "doc_id")
      graft.operators.QualityClassifier.prCurve(scored)
        .orderBy(col("threshold").desc)
    },

    // Unicode canonicalization (operators/Normalize): NFC text, changed
    // flag, U+FFFD mojibake count — the pre-dedup canonicalization pass.
    // The synthetic corpus is ASCII (changed=false, n_repl=0 rows), so
    // the probe pins the distributed mechanism + cross-engine hash of
    // the full output; real composed/decomposed/ligature/width cases
    // are pinned by NormalizeSpec against java.text.Normalizer.
    Probe.df("q_text_nfc",
      graft.operators.Normalize.oracleSql("documents", "doc_id", "text")) {
      (s, dir) =>
        graft.operators.Normalize.profile(
            Tables.load(s, dir, "documents"), "doc_id", "text")
          .orderBy("doc_id")
    },

    // Character-entropy quality signal (functions/CharEntropy kernel):
    // exact codepoint counts + Shannon entropy, the gibberish/template
    // detector. The entropy double rides the driver hash's 1e-9 float
    // tolerance (summation-order ulp drift only — log2 values are
    // REPORTED, never rank or select rows cross-engine).
    Probe.df("q_text_entropy",
      graft.operators.TextAnalysis
        .entropyOracleSql("documents", "doc_id", "text")) { (s, dir) =>
      graft.operators.TextAnalysis.entropyProfile(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // Stack/StarCoder code-data filters (operators/CodeRules): line
    // length pathologies, alphanumeric fraction, auto-generated
    // markers. Planted: every 5th doc gets a 1200-char "minified"
    // line (max_line_len rule), every 7th an auto-generated header;
    // fractions and means are single IEEE divisions of exact counts.
    Probe.df("q_code_rules",
      """WITH planted AS (SELECT doc_id, text
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN chr(10) || repeat('x', 1200) ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN chr(10) || '// AUTO-GENERATED, do not edit'
        |         ELSE '' END AS text
        |  FROM documents),
        |""".stripMargin +
        graft.operators.CodeRules.oracleSql("planted", "doc_id", "text")
          .stripPrefix("WITH ")) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(col("text"),
          when(col("doc_id") % 5 === 0,
            concat(lit("\n"), repeat(lit("x"), 1200))).otherwise(lit("")),
          when(col("doc_id") % 7 === 0,
            lit("\n// AUTO-GENERATED, do not edit")).otherwise(lit("")))
          .as("text"))
      graft.operators.CodeRules.filterFlags(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // C4 cleaning rules (operators/C4Rules — Raffel et al. 2020 §2.2,
    // the T5 corpus filter): line-level terminal-punctuation /
    // min-words / javascript rules + page-level brace and lorem-ipsum
    // flags. The word-salad corpus gets PLANTED lines exercising every
    // rule: a kept sentence, a 2-word line (dropped), a javascript
    // line (dropped), a closing sentence (kept); every 7th doc gets a
    // brace, every 11th a lorem-ipsum sentence (page flags false,
    // line rules still apply to it — C4's separation of levels).
    Probe.df("q_c4_rules",
      """WITH planted AS (SELECT doc_id,
        |    'Good sentence number ' || CAST(doc_id AS VARCHAR) || '.'
        |    || chr(10) || text
        |    || chr(10) || 'short line'
        |    || chr(10) || 'This line mentions javascript here.'
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN chr(10) || 'code block { starts here.' ELSE '' END
        |    || CASE WHEN doc_id % 11 = 0
        |         THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
        |    || chr(10) || 'A proper closing sentence!' AS text
        |  FROM documents),
        |""".stripMargin +
        graft.operators.C4Rules.oracleSql("planted", "doc_id", "text")
          .stripPrefix("WITH ")) { (s, dir) =>
      val planted = Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(
          lit("Good sentence number "), col("doc_id").cast("string"),
          lit(".\n"), col("text"),
          lit("\nshort line\nThis line mentions javascript here."),
          when(col("doc_id") % 7 === 0,
            lit("\ncode block { starts here.")).otherwise(lit("")),
          when(col("doc_id") % 11 === 0,
            lit("\nlorem ipsum dolor sit amet.")).otherwise(lit("")),
          lit("\nA proper closing sentence!")).as("text"))
      graft.operators.C4Rules.clean(planted, "doc_id", "text")
        .orderBy("doc_id")
    },

    // THE ROUND-11 WEB-CURATION COMPOSITION: raw "crawled" HTML →
    // strip → NFC canonicalize → line-level boilerplate dedup →
    // entropy + readability quality columns — the first four stages
    // of a real web-corpus pipeline, chained, with ONE oracle
    // replaying every stage so drift anywhere breaks the hash (the
    // round-11 companion of q_pipeline_e2e / q_pipeline_curation).
    // The planted page carries its boilerplate as body LINES (nav bar,
    // copyright) so the line-dedup stage has real cross-doc work.
    {
      val p1 = "<html><head><script>\nvar x = 1;\n</script></head>" +
        "<body>\nHome | About | Contact\n<p>"
      val p2 = "</p>\nCopyright 2024 Example Corp &amp; Partners\n" +
        "</body></html>"
      def sqlLit(s: String): String =
        "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
      Probe.df("q_curation_web",
        s"""WITH t AS (SELECT doc_id, ${graft.operators.Normalize.stripHtmlSql(
              s"(${sqlLit(p1)} || text || ${sqlLit(p2)})")} AS txt
           |  FROM documents),
           |nf AS (SELECT doc_id, nfc_normalize(txt) AS txt FROM t),
           |ls AS (SELECT doc_id, string_split(txt, chr(10)) AS la FROM nf),
           |l0 AS (SELECT doc_id, unnest(
           |    [{'pos': i, 'line': la[i]} for i in range(1, len(la) + 1)]) AS u
           |  FROM ls),
           |l AS (SELECT doc_id, u.pos AS pos, u.line AS line,
           |    md5(u.line) AS fp FROM l0),
           |bo AS (SELECT fp FROM (
           |    SELECT fp, count(DISTINCT doc_id) AS nd FROM l GROUP BY fp)
           |  WHERE nd >= 2),
           |kp AS (SELECT l.* FROM l ANTI JOIN bo USING (fp)),
           |r AS (SELECT doc_id,
           |    string_agg(line, chr(10) ORDER BY pos) AS clean_text,
           |    CAST(count(*) AS BIGINT) AS n_kept FROM kp GROUP BY doc_id),
           |c AS (SELECT ls.doc_id, COALESCE(r.clean_text, '') AS clean_text,
           |    CAST(len(ls.la) AS BIGINT) - COALESCE(r.n_kept, 0) AS n_dropped
           |  FROM ls LEFT JOIN r USING (doc_id)),
           |ch AS (SELECT doc_id, unnest(list_filter(
           |    string_split_regex(clean_text, ''), x -> x <> '')) AS cx
           |  FROM c),
           |ce AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chars,
           |    entropy(cx) AS char_entropy FROM ch GROUP BY doc_id),
           |w AS (SELECT doc_id,
           |    list_filter(string_split_regex(lower(clean_text), '\\s+'),
           |      x -> x <> '') AS ws,
           |    CAST(greatest(1, len(regexp_extract_all(clean_text, '[.!?]+')))
           |      AS BIGINT) AS n_sentences,
           |    CAST(len(regexp_extract_all(lower(clean_text), '[aeiouy]+'))
           |      AS BIGINT) AS runs
           |  FROM c),
           |rc AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
           |    n_sentences, runs + CAST(len(list_filter(ws,
           |      x -> NOT regexp_matches(x, '[aeiouy]'))) AS BIGINT) AS n_syll
           |  FROM w)
           |SELECT c.doc_id, c.clean_text, c.n_dropped,
           |  COALESCE(ce.n_chars, 0) AS n_chars,
           |  COALESCE(ce.char_entropy, 0.0) AS char_entropy,
           |  rc.n_words,
           |  CASE WHEN rc.n_words = 0 THEN CAST(0.0 AS DOUBLE)
           |       ELSE CAST(0.39 AS DOUBLE) * (rc.n_words::DOUBLE / rc.n_sentences::DOUBLE)
           |          + CAST(11.8 AS DOUBLE) * (rc.n_syll::DOUBLE / rc.n_words::DOUBLE)
           |          - CAST(15.59 AS DOUBLE) END AS fk_grade
           |FROM c LEFT JOIN ce USING (doc_id) JOIN rc USING (doc_id)
           |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
        import graft.operators.{Boilerplate, Normalize, TextAnalysis}
        val stripped = Tables.load(s, dir, "documents")
          .select(col("doc_id"), Normalize.stripHtml(
            concat(lit(p1), col("text"), lit(p2))).as("text"))
        val canon = stripped.select(col("doc_id"),
          Normalize.unicode(col("text")).as("text"))
        val deduped = Boilerplate
          .dedupLinesProfile(canon, "doc_id", "text")
          .select(col("doc_id"), col("clean_text"), col("n_dropped"))
        val asText = deduped.select(col("doc_id"),
          col("clean_text").as("text"))
        val ent = TextAnalysis.entropyProfile(asText, "doc_id", "text")
          .select(col("doc_id"), col("n_chars"), col("char_entropy"))
        val read = TextAnalysis.readability(asText, "doc_id", "text")
          .select(col("doc_id"), col("n_words"), col("fk_grade"))
        deduped.join(ent, Seq("doc_id")).join(read, Seq("doc_id"))
          .orderBy("doc_id")
      }
    },

    // Overlapping word-window chunking (TextAnalysis.chunkWindows):
    // 40-word chunks every 20 words — the RAG/long-doc context-prep
    // split. The oracle replays start generation (integer floor
    // division), the clamped tail slice, and the joined chunk text.
    Probe.df("q_text_chunks",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |f AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS n FROM w
         |      WHERE len(ws) > 0),
         |c AS (SELECT doc_id, ws, n,
         |    unnest(range(0, (n - 1) // 20 + 1)) AS chunk_id FROM f)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(least(40, n - chunk_id * 20) AS BIGINT) AS n_words,
         |  array_to_string(ws[CAST(chunk_id * 20 + 1 AS INT):CAST(chunk_id * 20 + 40 AS INT)], ' ') AS chunk_text
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      graft.operators.TextAnalysis.chunkWindows(
          Tables.load(s, dir, "documents"), "doc_id", "text", 40, 20)
        .orderBy("doc_id", "chunk_id")
    },

    // Flesch–Kincaid readability (TextAnalysis.readability): exact
    // word/sentence/syllable-heuristic counts, grade as a fixed-order
    // IEEE chain — the classic quality-stack gate. The heuristic
    // (vowel-group runs, floor 1, no silent-e rule) IS the contract;
    // both engines run the same regexes.
    Probe.df("q_text_readability",
      graft.operators.TextAnalysis
        .readabilityOracleSql("documents", "doc_id", "text")) { (s, dir) =>
      graft.operators.TextAnalysis.readability(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // HTML → text extraction (operators/Normalize.stripHtml): the
    // corpus is plain text, so each doc is WRAPPED in a deterministic
    // HTML page first (multi-line script with a bare `<` in its body,
    // style, multi-line comment, attributes, self-closing tag, the six
    // entities incl. the double-escaped `&amp;lt;`) — then both
    // engines strip it with the identical pattern chain; the planted
    // page exercises every removal rule and the decode order.
    {
      val p1 = "<html><head><style type=\"text/css\">p {color: red}\n" +
        "</style><script>\nvar x = 1; if (x < 2) { x++; }\n" +
        "</script></head><body><!-- draft\nnote --><p class=\"main\">"
      val p2 = "</p><br/><div id=\"d1\">A &amp; B &amp;lt; " +
        "&lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div></body></html>"
      def sqlLit(s: String): String =
        "'" + s.replace("'", "''").replace("\n", "' || chr(10) || '") + "'"
      Probe.df("q_html_strip",
        s"""SELECT doc_id, ${graft.operators.Normalize.stripHtmlSql(
            s"(${sqlLit(p1)} || text || ${sqlLit(p2)})")} AS clean
           |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), graft.operators.Normalize.stripHtml(
            concat(lit(p1), col("text"), lit(p2))).as("clean"))
          .orderBy("doc_id")
      }
    },

    // Count-Min sketch heavy hitters (functions/CountMinSketch +
    // operators/HeavyHitters): one-pass frequency estimation with
    // O(depth×width) state — the sub-linear-shuffle tier of q_vocab.
    // width=32 < |vocab| FORCES collisions, so est > cnt on some rows
    // and the min-over-rows mechanism is genuinely exercised; both
    // engines replay the identical md5-slice bucket counters (exact
    // integer sums — order-independent), so est is bit-exact. The
    // CMS overestimate guarantee (est ≥ cnt always) is pinned by
    // CountMinSpec properties; here the oracle checks the values.
    Probe.df("q_cms_heavy",
      s"""WITH w AS (SELECT doc_id, $duckWords AS ws FROM documents),
         |t AS (SELECT unnest(ws) AS term FROM w),
         |r AS (SELECT unnest([0, 1, 2]) AS i),
         |hits AS (SELECT i, ${duckHex8("substr(md5(term), 8*i+1, 8)")} % 32
         |    AS bucket FROM t, r),
         |cnt AS (SELECT i, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM hits GROUP BY i, bucket),
         |d AS (SELECT DISTINCT term FROM t),
         |db AS (SELECT term, i,
         |    ${duckHex8("substr(md5(term), 8*i+1, 8)")} % 32 AS bucket
         |  FROM d, r),
         |est AS (SELECT term, min(c) AS est FROM db
         |  JOIN cnt USING (i, bucket) GROUP BY term),
         |exact AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt
         |  FROM t GROUP BY term)
         |SELECT term, est, cnt FROM est JOIN exact USING (term)
         |WHERE est >= 500 ORDER BY term""".stripMargin) { (s, dir) =>
      val d = Tables.load(s, dir, "documents")
      val exact = d.select(explode(
          graft.operators.Dedup.words(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("cnt"))
      graft.operators.HeavyHitters
        .heavyHitters(d, "text", minCount = 500L, depth = 3, width = 32)
        .join(exact, "term")
        .orderBy("term")
    },

    // PageRank (operators/PageRank): the web-graph quality prior, in
    // all-integer micro-unit arithmetic so three damped iterations
    // hash-match DuckDB's unrolled-CTE replay bit-exactly (a floating
    // PageRank never could — summation order). The corpus has no link
    // graph, so edges are PLANTED: doc_id → (doc_id² + 13k) % N for
    // k = 1..3 — quadratic residues collide, so in-degrees (and hence
    // ranks) genuinely vary. N rides a broadcast 1-row count on the
    // Spark side, a CTE on the oracle side.
    Probe.df("q_pagerank",
      graft.operators.PageRank.oracleSql(
        """mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM documents),
          |e AS (SELECT doc_id AS src, (doc_id*doc_id + 13*k) % m AS dst
          |  FROM documents, mm, (SELECT unnest([1, 2, 3]) AS k) t)""".stripMargin,
        iters = 3)) { (s, dir) =>
      val d = Tables.load(s, dir, "documents").select(col("doc_id"))
      val cnt = d.agg(count(lit(1)).as("m"))
      val edges = d.crossJoin(broadcast(cnt)).select(
        col("doc_id").as("src"),
        explode(array(
          (col("doc_id") * col("doc_id") + lit(13)) % col("m"),
          (col("doc_id") * col("doc_id") + lit(26)) % col("m"),
          (col("doc_id") * col("doc_id") + lit(39)) % col("m"))).as("dst"))
      graft.operators.PageRank.ranks(edges, iters = 3).orderBy("id")
    }
  )
}
