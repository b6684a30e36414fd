package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed unigram-LM tokenizer training (the
  * SentencePiece family, Kudo ACL '18) via hard (Viterbi) EM — the
  * subword-vocabulary trainer that complements [[BpeTrain]]: BPE grows a
  * vocab bottom-up by merges; the unigram model starts from a large seed
  * vocab and re-estimates piece probabilities by segmenting the corpus
  * with the current model. (Beyond-ref extension — the reference engine
  * ships no tokenizer training at all; lib.rs:678 scopes it to SQL.)
  *
  * Distributed shape (the [[BpeTrain]] / [[Similarity.kmeansFit]]
  * recipe): ONE corpus scan builds the word-frequency table; per EM
  * round, one model-sized collect (the vocab — bounded by `seedSize` +
  * the corpus alphabet) broadcasts into a codegen Viterbi kernel, and
  * one explode + map-side-combined aggregate over the |words| table
  * re-counts pieces. Nothing quadratic, no shuffle of the corpus; at
  * 100 TB the per-round cost is the word-table aggregate.
  *
  * EXACTNESS: Viterbi runs on probability PRODUCTS (`dp(k) = max dp(j)
  * · c/N`), never `ln` — IEEE multiply/divide are correctly rounded, so
  * with a fixed evaluation order every dp value and comparison is
  * bit-identical to the DuckDB oracle replaying the same recurrence as
  * unrolled per-position CTEs ([[oracleSql]]); libm `ln` differs across
  * engines in the last ulp (the LmScore.avg_logp precedent) and would
  * poison argmax decisions. Ties break toward the smallest split start
  * (ascending scan, strict improvement) — mirrored in SQL as
  * `ORDER BY sc DESC, pos ASC`.
  *
  * Model contract: words longer than `maxWordLen` are out of the model's
  * domain (train AND encode skip them — SentencePiece's
  * max-sentencepiece-length analogue); the seed is every substring up to
  * `maxPieceLen` chars with corpus count ≥ `minCount` (single chars
  * always kept), capped at the `seedSize` most frequent (ties by piece);
  * each M-step re-seeds absent single chars at count 1, so every
  * in-domain word stays segmentable every round.
  */
object UnigramLm {

  /** All substrings of `word` of length 1..maxPieceLen, as one flat
    * array (duplicates kept — the seed counts multiplicity). */
  private def substrings(word: Column, maxPieceLen: Int): Column =
    flatten(transform(sequence(lit(1), length(word)), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(word) - i + 1)),
        l => word.substr(i, l))))

  /** Driver-side tie-break order for pieces: UTF-8 BYTE order, matching
    * both Spark's engine-side UTF8String comparison and DuckDB's
    * default binary collation. Java's String.compareTo is UTF-16 order,
    * which ranks supplementary characters BEFORE U+E000..U+FFFF — a
    * count tie straddling the prune cut would keep a different piece
    * than the oracle (self-review catch). */
  private val utf8Order: Ordering[String] =
    (a: String, b: String) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a)
        .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
  private val byCountDescPiece: Ordering[(String, Long)] =
    Ordering.Tuple2(Ordering.Long, utf8Order)
      .on[(String, Long)] { case (p, c) => (-c, p) }

  private def wordCounts(df: DataFrame, textCol: String,
      maxWordLen: Int): DataFrame =
    df.select(explode(Dedup.words(col(textCol))).as("word"))
      .where(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Final vocab after `iters` Viterbi-EM rounds:
    * (rank, piece, cnt, p) ordered by count desc, piece. The returned
    * frame is a driver-local artifact (the model IS driver-sized, like
    * [[BpeTrain.train]]'s merge table). */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2, seedSize: Int = 200, maxWordLen: Int = 12,
      iters: Int = 2, targetSize: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val words = wordCounts(df, textCol, maxWordLen).persist()
    try {
      val vocab = emRounds(words, maxPieceLen, minCount, seedSize, iters,
        targetSize)
      val n = vocab.map(_._2).sum
      val ranked = vocab.sorted(byCountDescPiece).zipWithIndex.map {
        case ((p, c), i) =>
          (i + 1L, p, c, c.toDouble / n.toDouble)
      }
      spark.createDataFrame(ranked).toDF("rank", "piece", "cnt", "p")
    } finally words.unpersist()
  }

  /** The EM loop over the persisted word table; returns the final
    * (piece, cnt) vocab, driver-side. */
  private def emRounds(words: DataFrame, maxPieceLen: Int, minCount: Long,
      seedSize: Int, iters: Int, targetSize: Int): Seq[(String, Long)] = {
    val seeds = words
      .select(col("cnt"), explode(substrings(col("word"), maxPieceLen))
        .as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("c"))
      .where(col("c") >= minCount || length(col("piece")) === 1)
      .persist()
    try {
      val top = seeds.orderBy(col("c").desc, col("piece")).limit(seedSize)
      val chars = seeds.where(length(col("piece")) === 1)
      // the corpus alphabet — the coverage floor re-seeded every round
      val charSet = chars.select("piece").collect()
        .map(_.getString(0)).toSet
      var vocab: Seq[(String, Long)] = top.unionByName(chars).distinct()
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      for (_ <- 1 to iters) {
        val n = vocab.map(_._2).sum
        val vmap = vocab.map { case (p, c) =>
          p -> c.toDouble / n.toDouble
        }.toMap
        val segmented = words.select(col("cnt"),
          explode(org.apache.spark.sql.graftaccess.Internals.column(
            graft.functions.ViterbiSegment(
              org.apache.spark.sql.graftaccess.Internals
                .expression(col("word")),
              vmap, maxPieceLen))).as("piece"))
          .groupBy("piece").agg(sum(col("cnt")).as("c"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        // Pruning (SentencePiece's shrink-to-target, hard-EM form):
        // keep the `targetSize` highest-count pieces (ties by piece);
        // single chars always survive — at their true count if they
        // earned one, at the floor of 1 otherwise.
        val kept =
          if (targetSize > 0)
            segmented.sorted(byCountDescPiece).take(targetSize)
          else segmented
        val keptSet = kept.map(_._1).toSet
        val segMap = segmented.toMap
        vocab = kept ++ charSet.diff(keptSet).toSeq.sorted
          .map(ch => (ch, segMap.getOrElse(ch, 1L)))
      }
      vocab
    } finally seeds.unpersist()
  }

  /** Every document tokenized by the vocab [[train]] learns on the same
    * corpus: (idCol, syms array<string>), words flattened in document
    * order; out-of-domain words (longer than `maxWordLen`) are skipped,
    * per the model contract. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int = 4, minCount: Long = 2, seedSize: Int = 200,
      maxWordLen: Int = 12, iters: Int = 2, targetSize: Int = 0): DataFrame = {
    val model = train(df, textCol, maxPieceLen, minCount, seedSize,
        maxWordLen, iters, targetSize)
      .select("piece", "p").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    val seg = org.apache.spark.sql.graftaccess.Internals.column(
      graft.functions.ViterbiSegment(
        org.apache.spark.sql.graftaccess.Internals
          .expression(col("word")),
        model, maxPieceLen))
    df.select(col(idCol),
        posexplode(Dedup.words(col(textCol))).as(Seq("pos", "word")))
      .where(length(col("word")) <= maxWordLen)
      .withColumn("syms", seg)
      .where(col("syms").isNotNull)
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        x => x.getField("syms"))).as("syms"))
  }

  /** MaxMatch (greedy longest-match-first — WordPiece INFERENCE)
    * encoding under the SAME trained vocab: at each position take the
    * longest vocab piece; a word with an unmatchable position maps to
    * the single `unk` piece (standard WordPiece failure semantics —
    * unreachable for in-corpus text thanks to the coverage floor, but
    * the contract matters for out-of-corpus input). Score-free, so the
    * oracle replay is pure set membership — no float anywhere. */
  def maxMatchEncode(df: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int = 4, minCount: Long = 2, seedSize: Int = 200,
      maxWordLen: Int = 12, iters: Int = 2, targetSize: Int = 0,
      unk: String = "[UNK]"): DataFrame = {
    val pieces = train(df, textCol, maxPieceLen, minCount, seedSize,
        maxWordLen, iters, targetSize)
      .select("piece").collect().map(_.getString(0)).toSeq
    val seg = org.apache.spark.sql.graftaccess.Internals.column(
      graft.functions.MaxMatchSegment(
        org.apache.spark.sql.graftaccess.Internals
          .expression(col("word")),
        pieces, maxPieceLen, unk))
    df.select(col(idCol),
        posexplode(Dedup.words(col(textCol))).as(Seq("pos", "word")))
      .where(length(col("word")) <= maxWordLen)
      .withColumn("syms", seg)
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        x => x.getField("syms"))).as("syms"))
  }

  // ---------------------------------------------------------------- oracle

  private val duckWords =
    """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""

  /** The shared training CTE chain: words → seed vocab v0 → per round
    * (p{t}, unrolled dp CTEs d{t}_k, segmentation, recount v{t}).
    * MATERIALIZED throughout, like [[BpeTrain.oracleCtes]]. */
  private def oracleCtes(table: String, maxPieceLen: Int, minCount: Long,
      seedSize: Int, maxWordLen: Int, iters: Int,
      targetSize: Int): String = {
    val rounds = (1 to iters).map { t =>
      val prev = s"v${t - 1}"
      val keep =
        if (targetSize > 0)
          s"(SELECT piece, c FROM cnts$t ORDER BY c DESC, piece LIMIT $targetSize)"
        else s"cnts$t"
      val dp = (1 to maxWordLen).map { k =>
        val preds = (math.max(0, k - maxPieceLen) until k)
          .map(j => s"SELECT * FROM d${t}_$j").mkString(" UNION ALL ")
        s"""d${t}_$k AS MATERIALIZED (
           |  SELECT word, cnt, pos, sc, ps FROM (
           |    SELECT d.word, d.cnt, $k AS pos, d.sc * v.p AS sc,
           |      list_append(d.ps, v.piece) AS ps,
           |      row_number() OVER (PARTITION BY d.word
           |        ORDER BY d.sc * v.p DESC, d.pos ASC) AS rk
           |    FROM ($preds) d
           |    JOIN p$t v ON v.piece = substr(d.word, d.pos + 1, $k - d.pos)
           |    WHERE length(d.word) >= $k
           |  ) WHERE rk = 1)""".stripMargin
      }.mkString(",\n")
      val seg = (1 to maxWordLen)
        .map(k => s"SELECT cnt, ps FROM d${t}_$k WHERE length(word) = $k")
        .mkString(" UNION ALL ")
      s"""p$t AS MATERIALIZED (SELECT piece,
         |  c::DOUBLE / (SELECT CAST(sum(c) AS BIGINT) FROM $prev)::DOUBLE AS p
         |  FROM $prev),
         |d${t}_0 AS MATERIALIZED (SELECT word, cnt, 0 AS pos,
         |  CAST(1.0 AS DOUBLE) AS sc, []::VARCHAR[] AS ps FROM w),
         |$dp,
         |cnts$t AS MATERIALIZED (SELECT piece, CAST(sum(cnt) AS BIGINT) AS c
         |  FROM (SELECT cnt, unnest(ps) AS piece FROM ($seg)) GROUP BY 1),
         |k$t AS MATERIALIZED (SELECT piece, c FROM $keep),
         |v$t AS MATERIALIZED (
         |  SELECT piece, c FROM k$t
         |  UNION ALL
         |  SELECT ch.piece, coalesce(
         |    (SELECT c FROM cnts$t WHERE piece = ch.piece),
         |    CAST(1 AS BIGINT)) AS c
         |  FROM chars ch
         |  WHERE ch.piece NOT IN (SELECT piece FROM k$t))""".stripMargin
    }.mkString(",\n")
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest($duckWords) AS word FROM $table)
       |  WHERE length(word) <= $maxWordLen GROUP BY 1),
       |seeds AS MATERIALIZED (
       |  SELECT piece, CAST(sum(cnt) AS BIGINT) AS c FROM (
       |    SELECT cnt, unnest(flatten(
       |      [[substr(word, i::INT, l::INT)
       |        for l in range(1, least($maxPieceLen, length(word)-i+1)+1)]
       |       for i in range(1, length(word)+1)])) AS piece FROM w)
       |  GROUP BY 1
       |  HAVING sum(cnt) >= $minCount OR length(piece) = 1),
       |chars AS MATERIALIZED (SELECT piece FROM seeds WHERE length(piece) = 1),
       |v0 AS MATERIALIZED (
       |  SELECT piece, c FROM
       |    (SELECT piece, c FROM seeds ORDER BY c DESC, piece LIMIT $seedSize)
       |  UNION
       |  SELECT piece, c FROM seeds WHERE length(piece) = 1),
       |$rounds""".stripMargin
  }

  /** DuckDB replay of [[train]] — same seed, same per-position Viterbi
    * recurrence (unrolled CTEs), same EM rounds. */
  def oracleSql(table: String, maxPieceLen: Int = 4, minCount: Long = 2,
      seedSize: Int = 200, maxWordLen: Int = 12, iters: Int = 2,
      targetSize: Int = 0): String =
    oracleCtes(table, maxPieceLen, minCount, seedSize, maxWordLen, iters,
      targetSize) +
      s"""
         |SELECT row_number() OVER (ORDER BY c DESC, piece) AS rank,
         |  piece, c AS cnt,
         |  c::DOUBLE / (SELECT CAST(sum(c) AS BIGINT) FROM v$iters)::DOUBLE AS p
         |FROM v$iters
         |ORDER BY rank""".stripMargin

  /** DuckDB replay of [[maxMatchEncode]]: the trained vocab v{iters},
    * then a greedy chain unrolled by STEP (each step consumes one
    * piece, longest-first; a completed word exits at its completion
    * step; never-completing words fall to the `unk` piece via the
    * LEFT JOIN). */
  def maxMatchOracleSql(table: String, idCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2, seedSize: Int = 200, maxWordLen: Int = 12,
      iters: Int = 2, targetSize: Int = 0,
      unk: String = "[UNK]"): String = {
    val steps = (1 to maxWordLen).map { s =>
      s"""g$s AS MATERIALIZED (
         |  SELECT word, pos, ps FROM (
         |    SELECT g.word, g.pos + length(v.piece) AS pos,
         |      list_append(g.ps, v.piece) AS ps,
         |      row_number() OVER (PARTITION BY g.word
         |        ORDER BY length(v.piece) DESC) AS rk
         |    FROM g${s - 1} g JOIN v$iters v
         |      ON g.pos < length(g.word)
         |     AND v.piece = substr(g.word, g.pos + 1, length(v.piece))
         |  ) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val doneUnion = (1 to maxWordLen)
      .map(s => s"SELECT word, pos, ps FROM g$s").mkString(" UNION ALL ")
    oracleCtes(table, maxPieceLen, minCount, seedSize, maxWordLen, iters,
      targetSize) +
      s""",
         |g0 AS (SELECT word, 0 AS pos, []::VARCHAR[] AS ps FROM w),
         |$steps,
         |done AS MATERIALIZED (
         |  SELECT word, ps FROM ($doneUnion) WHERE pos = length(word)),
         |wordmap AS MATERIALIZED (
         |  SELECT w.word, coalesce(d.ps, ['$unk']) AS ps
         |  FROM w LEFT JOIN done d ON w.word = d.word),
         |dw AS (SELECT $idCol, generate_subscripts(ws, 1) AS pos,
         |         unnest(ws) AS word
         |       FROM (SELECT $idCol, $duckWords AS ws FROM $table)),
         |enc AS (SELECT dw.$idCol, dw.pos, wordmap.ps
         |        FROM dw JOIN wordmap USING (word))
         |SELECT $idCol, flatten(list(ps ORDER BY pos)) AS syms
         |FROM enc GROUP BY $idCol
         |ORDER BY $idCol""".stripMargin
  }

  /** DuckDB replay of [[encode]]: the final round's word→pieces map
    * joined back to the corpus, flattened in word order. */
  def encodeOracleSql(table: String, idCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2, seedSize: Int = 200, maxWordLen: Int = 12,
      iters: Int = 2, targetSize: Int = 0): String = {
    // one more Viterbi pass (round iters+1's dp chain) under the FINAL
    // vocab v{iters} — exactly what encode's kernel runs
    val t = iters + 1
    oracleCtes(table, maxPieceLen, minCount, seedSize, maxWordLen, t,
      targetSize) +
      s""",
         |wordmap AS MATERIALIZED (
         |  SELECT word, ps FROM (${(1 to maxWordLen)
            .map(k => s"SELECT word, ps FROM d${t}_$k WHERE length(word) = $k")
            .mkString(" UNION ALL ")})),
         |dw AS (SELECT $idCol, generate_subscripts(ws, 1) AS pos,
         |         unnest(ws) AS word
         |       FROM (SELECT $idCol, $duckWords AS ws FROM $table)),
         |enc AS (SELECT dw.$idCol, dw.pos, wordmap.ps
         |        FROM dw JOIN wordmap USING (word))
         |SELECT $idCol, flatten(list(ps ORDER BY pos)) AS syms
         |FROM enc GROUP BY $idCol
         |ORDER BY $idCol""".stripMargin
  }
}
