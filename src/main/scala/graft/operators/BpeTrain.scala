package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic distributed BPE vocabulary training (Sennrich et al.
  * 2016): `merges` rounds of count-adjacent-symbol-pairs → pick the most
  * frequent pair (ties by pair string) → merge every occurrence — the
  * merge TABLE is the training artifact a tokenizer ships.
  *
  * Distributed shape (the [[Similarity.kmeansFit]] recipe): per round,
  * one explode + map-side-combined aggregate over the WORD-FREQUENCY
  * table (|vocab| rows, not the corpus — the corpus is read once for
  * word counts), then a 1-row collect of the argmax; the driver holds
  * only the O(merges) merge list. The rewritten word→symbols table is
  * MATERIALIZED every [[RoundsPerMaterialize]] rounds
  * ([[Checkpoints.truncate]]), so plan depth stays O(R) — per-round
  * replace chains over a literal seed would grow O(merges) deep and
  * O(merges²) in total work, a hard ceiling at real 32k-merge
  * vocabularies. Per-row string rewriting is deterministic, so results
  * stay bit-identical under any partitioning or materialization split.
  *
  * The merge rewrite runs on a space-sentineled symbol string via
  * `replace(s, ' a b ', ' ab ')`, applied [[MergePasses]] times: one
  * replace pass skips an occurrence whose delimiter space the previous
  * match consumed (`' a b a b '` → `' ab a b '`), and each extra pass
  * halves the remainder, so runs up to 2^passes symbols merge exactly —
  * both engines implement leftmost non-overlapping replace, and the
  * DuckDB oracle replays the identical pass count, so the probe is exact
  * even beyond that bound.
  */
object BpeTrain {

  val MergePasses = 6

  // ' h e l l o ' — (.) spaces every codepoint; trailing space comes
  // from the last "$1 " so only the sentinel prefix is prepended.
  private def spaced(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** The GPT-2 byte→unicode bijection (Radford et al. 2019; the public
    * encoder.py `bytes_to_unicode`): printable latin-1 bytes map to
    * themselves, every other byte to consecutive code points from
    * U+0100. Each of the 256 bytes gets a PRINTABLE single-codepoint
    * symbol, so byte-level merges ride the same space-sentineled string
    * machinery as character BPE — and any UTF-8 input (or arbitrary
    * binary) tokenizes without an unknown-character escape hatch. */
  val ByteUnicode: IndexedSeq[String] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    var n = 0
    (0 until 256).map { b =>
      if (printable(b)) new String(Character.toChars(b))
      else { val s = new String(Character.toChars(256 + n)); n += 1; s }
    }
  }

  /** ' Ã ¤ x ' — the word's UTF-8 bytes through [[ByteUnicode]], space-
    * sentineled. Bytes come from the hex of the encoded word (two hex
    * digits per byte), the same derivation the DuckDB oracle replays. */
  private def byteSpaced(word: Column): Column = {
    val mapArr = array(ByteUnicode.map(lit): _*)
    // qualified: this object's own `encode` shadows functions.encode
    val h = lower(hex(org.apache.spark.sql.functions.encode(word, "UTF-8")))
    val syms = transform(
      sequence(lit(1), (length(h) / lit(2)).cast("int")),
      i => element_at(mapArr,
        conv(h.substr(i * 2 - 1, lit(2)), 16, 10).cast("int") + 1))
    concat(lit(" "), concat_ws(" ", syms), lit(" "))
  }

  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1), i =>
        concat(element_at(syms, i), lit(" "), element_at(syms, i + 1))))
      .otherwise(array().cast("array<string>"))

  /** (rank, pair, merged, n) merge table. */
  def train(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    // The corpus is scanned ONCE for word counts; every round aggregates
    // the persisted |vocab|-row table (unpersisted before returning —
    // the result is a driver-local artifact with no lineage on it).
    val base = df
      .select(explode(Dedup.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      trainHybrid(spark, base, merges, spaced, spacedLocal)
    } finally base.unpersist()
  }

  /** [[train]] at BYTE level: seed symbols are the words' UTF-8 bytes
    * through [[ByteUnicode]] instead of their code points — multi-byte
    * characters start split and must EARN their merge, exactly GPT-2's
    * vocabulary construction. Same distributed shape as [[train]]. */
  def trainBytes(df: DataFrame, textCol: String, merges: Int): DataFrame = {
    val spark = df.sparkSession
    val base = df
      .select(explode(Dedup.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      trainHybrid(spark, base, merges, byteSpaced, byteSpacedLocal)
    } finally base.unpersist()
  }

  /** Distinct-word-count bound (SQL conf) at or under which the merge
    * LOOP runs driver-side ([[trainLocalRounds]]); 0 forces the
    * distributed loop. The word-frequency AGGREGATE — the only
    * corpus-sized work — is always distributed. */
  val LocalTrainMaxWordsKey = "graft.bpe.localTrainMaxWords"

  /** Default [[LocalTrainMaxWordsKey]]: 2M distinct words ≈ tens of MB
    * of driver strings — far under any real driver heap, far over any
    * real tokenizer-training corpus's distinct-word table (which is
    * vocabulary-shaped: it grows ~Heaps-law sublinearly, not with the
    * corpus). */
  val LocalTrainMaxWordsDefault = 2000000L

  /** HYBRID dispatch (VERDICT r13 #2): the distributed loop is correct
    * and linear, but each merge round is one Spark aggregate + a 1-row
    * argmax collect — a real 32k-merge vocabulary would be 32k
    * SEQUENTIAL jobs, hours of pure scheduler latency on work whose
    * data (the distinct-word table) is model-sized. The public
    * HuggingFace-trainer shape fixes the altitude: aggregate word
    * frequencies ONCE distributed, then run the merge loop driver-side
    * over that table when it fits [[LocalTrainMaxWordsKey]]. Both
    * tiers are BIT-identical (OperatorsSpec pins local == distributed
    * on the probe fixture; Java String.replace ≡ Spark replace,
    * UTF-8-byte tie order ≡ UTF8String/DuckDB binary order), so the
    * DuckDB oracles hold regardless of tier; the distributed loop
    * stays as the oracle-replayable fallback above the bound. */
  private def trainHybrid(spark: SparkSession, base: DataFrame,
      merges: Int, seed: Column => Column, seedLocal: String => String,
      wordPiece: Boolean = false): DataFrame = {
    val bound = spark.conf.getOption(LocalTrainMaxWordsKey)
      .map(_.trim.toLong).getOrElse(LocalTrainMaxWordsDefault)
    if (bound > 0 && base.count() <= bound) {
      val words = base.collect()
        .map(r => (seedLocal(r.getString(0)), r.getLong(1)))
      val acc = trainLocalRounds(words, merges, wordPiece)
      val out = spark.createDataFrame(acc)
        .toDF("rank", "pair", "merged", "n", "score")
      if (wordPiece) out else out.drop("score")
    } else trainRounds(spark, base, merges, seed, wordPiece)
  }

  /** `a < b` by UNSIGNED UTF-8 BYTES (the shared [[OpConf.utf8Lt]]) —
    * ties must break in Spark's UTF8String order, never Java's UTF-16
    * compareTo. */
  private def utf8Lt(a: String, b: String): Boolean = OpConf.utf8Lt(a, b)

  /** Driver-side twin of [[spaced]]: the SAME java.util.regex rewrite
    * Spark's regexp_replace runs. */
  private val SpacedRe = java.util.regex.Pattern.compile("(.)")
  private def spacedLocal(word: String): String =
    " " + SpacedRe.matcher(word).replaceAll("$1 ")

  /** Driver-side twin of [[byteSpaced]]. */
  private def byteSpacedLocal(word: String): String = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bs.length * 3 + 2)
    sb.append(' ')
    var i = 0
    while (i < bs.length) {
      sb.append(ByteUnicode(bs(i) & 0xff)).append(' '); i += 1
    }
    sb.toString
  }

  /** The merge loop over a DRIVER-resident (seeded symbol string, cnt)
    * table — the [[trainHybrid]] fast tier. Each round recounts
    * adjacent pairs (and symbol unigrams for WordPiece) with exact
    * integer sums, picks the same (n DESC | score DESC, pair ASC
    * by UTF-8 bytes) argmax, and rewrites via the same
    * leftmost-non-overlapping literal replace applied ≤ [[MergePasses]]
    * times (a pass that finds no occurrence is the identity, so
    * stopping early is exact). O(merges · total symbols) with zero
    * scheduler round-trips. */
  private def trainLocalRounds(words: Array[(String, Long)], merges: Int,
      wordPiece: Boolean): Vector[(Int, String, String, Long, Double)] = {
    val strs = words.map(_._1)
    val cnts = words.map(_._2)
    var acc = Vector.empty[(Int, String, String, Long, Double)]
    val sum = new java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] {
      override def apply(a: java.lang.Long, b: java.lang.Long): java.lang.Long = a + b
    }
    var r = 1
    while (r <= merges) {
      val pc = new java.util.HashMap[String, java.lang.Long]()
      val uc = if (wordPiece) new java.util.HashMap[String, java.lang.Long]() else null
      var i = 0
      while (i < strs.length) {
        val sy = strs(i).trim.split(" ")
        val c = java.lang.Long.valueOf(cnts(i))
        if (wordPiece) {
          var j = 0
          while (j < sy.length) { uc.merge(sy(j), c, sum); j += 1 }
        }
        var j = 0
        while (j < sy.length - 1) {
          pc.merge(sy(j) + " " + sy(j + 1), c, sum); j += 1
        }
        i += 1
      }
      if (pc.isEmpty) return acc // no word has >= 2 symbols left
      var bestP: String = null
      var bestN = 0L
      var bestS = 0.0
      val it = pc.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val p = e.getKey
        val n = e.getValue.longValue()
        if (!wordPiece) {
          if (bestP == null || n > bestN || (n == bestN && utf8Lt(p, bestP))) {
            bestP = p; bestN = n
          }
        } else {
          // the SAME two chained correctly-rounded IEEE divisions as the
          // distributed tier and the oracle: CAST(n)/CAST(lu)/CAST(ru)
          val sp = p.indexOf(' ')
          val s = n.toDouble / uc.get(p.substring(0, sp)).toDouble /
            uc.get(p.substring(sp + 1)).toDouble
          if (bestP == null || s > bestS || (s == bestS && utf8Lt(p, bestP))) {
            bestP = p; bestN = n; bestS = s
          }
        }
      }
      val merged = bestP.replace(" ", "")
      acc = acc :+ ((r, bestP, merged, bestN, if (wordPiece) bestS else 0.0))
      val from = " " + bestP + " "
      val to = " " + merged + " "
      i = 0
      while (i < strs.length) {
        var s = strs(i)
        var k = 0
        while (k < MergePasses && s.contains(from)) {
          s = s.replace(from, to); k += 1
        }
        strs(i) = s
        i += 1
      }
      r += 1
    }
    acc
  }

  /** Materialize the rewritten word→symbols table every this many merge
    * rounds. Without it the round-r symbol column re-applies the WHOLE
    * accumulated chain to the seed — r·[[MergePasses]] nested replaces,
    * O(merges²) total work, and codegen's 64KB method limit long before
    * a real 32k-merge vocabulary. With it, plan depth is bounded at
    * R·MergePasses replaces over a leaf (the |vocab|-row table through
    * [[Checkpoints.truncate]]), total work O(merges·|vocab|), and the
    * result is bit-identical — materialization changes where the string
    * lives between rounds, not a single replace. */
  val RoundsPerMaterialize = 8

  /** Pending-merge chain applied to an already-(partially-)rewritten
    * symbol column. */
  private def applyMerges(c0: Column,
      pending: Seq[(String, String)]): Column =
    pending.foldLeft(c0) { case (c, (p, m)) =>
      (1 to MergePasses).foldLeft(c)((cc, _) =>
        call_function("replace", cc, lit(s" $p "), lit(s" $m ")))
    }

  /** The shared training loop. `wordPiece = false` picks the round's
    * merge by raw pair count (BPE); `true` by the likelihood score
    * n/(l·r) over the round's symbol unigram counts (WordPiece), adding
    * a `score` output column. Everything else — materialize cadence,
    * pending-chain bookkeeping, tie order — is ONE copy. */
  private def trainRounds(spark: SparkSession, base: DataFrame,
      merges: Int, seed: Column => Column,
      wordPiece: Boolean = false): DataFrame = {
    var acc = Vector.empty[(Int, String, String, Long, Double)]
    // (word, cnt, s): s carries every merge up to the last materialize;
    // `pending` holds the ≤ RoundsPerMaterialize merges since
    var cur = base.select(col("word"), col("cnt"), seed(col("word")).as("s"))
    var pending = Vector.empty[(String, String)]
    def result = {
      Checkpoints.discard(cur) // the merge table never reads cur again
      val out = spark.createDataFrame(acc)
        .toDF("rank", "pair", "merged", "n", "score")
      if (wordPiece) out else out.drop("score")
    }
    for (r <- 1 to merges) {
      if (pending.size >= RoundsPerMaterialize) {
        val next = Checkpoints.truncate(cur.select(col("word"), col("cnt"),
          applyMerges(col("s"), pending).as("s")))
        Checkpoints.discard(cur) // superseded segment's reliable files
        cur = next
        pending = Vector.empty
      }
      val sy = cur.select(col("cnt"),
        split(trim(applyMerges(col("s"), pending)), " ").as("sy"))
      val best = if (!wordPiece) {
        sy.select(col("cnt"), explode(adjacentPairs(col("sy"))).as("pair"))
          .groupBy("pair").agg(sum(col("cnt")).as("n"))
          .orderBy(col("n").desc, col("pair"))
          .limit(1).collect()
      } else {
        // both aggregates read the same rewritten symbols; persisted so
        // the ≤ RoundsPerMaterialize replace chain runs once per word
        val syp = sy.persist()
        try {
          val uni = syp.select(col("cnt"), explode(col("sy")).as("sym"))
            .groupBy("sym").agg(sum(col("cnt")).as("u"))
          syp.select(col("cnt"), explode(adjacentPairs(col("sy"))).as("pair"))
            .groupBy("pair").agg(sum(col("cnt")).as("n"))
            .withColumn("lsym", split(col("pair"), " ").getItem(0))
            .withColumn("rsym", split(col("pair"), " ").getItem(1))
            .join(broadcast(uni.toDF("lsym", "lu")), "lsym")
            .join(broadcast(uni.toDF("rsym", "ru")), "rsym")
            .select(col("pair"), col("n"),
              (col("n").cast("double") / col("lu").cast("double") /
                col("ru").cast("double")).as("score"))
            .orderBy(col("score").desc, col("pair"))
            .limit(1).collect()
        } finally syp.unpersist()
      }
      if (best.isEmpty) return result
      val p = best(0).getAs[String]("pair")
      val score = if (wordPiece) best(0).getAs[Double]("score") else 0.0
      acc = acc :+ ((r, p, p.replace(" ", ""), best(0).getAs[Long]("n"), score))
      pending = pending :+ ((p, p.replace(" ", "")))
    }
    result
  }

  /** WordPiece-score vocabulary training (Schuster & Nakajima 2012; the
    * score the HuggingFace WordPiece trainer documents): per round the
    * merged pair maximizes freq(pair) / (freq(left) · freq(right)) —
    * likelihood gain, favoring pairs whose parts rarely appear apart —
    * instead of BPE's raw freq(pair). Same distributed shape as
    * [[train]] plus ONE extra map-side-combined aggregate per round (the
    * symbol unigram counts) and two broadcast joins of that tiny table.
    *
    * EXACTNESS: the score is CAST(n)/CAST(l)/CAST(r) — two chained
    * correctly-rounded IEEE divisions of exact integer counts (each
    * < 2^53), left-associated identically in both engines, so the
    * argmax (score DESC, pair ASC) replays bit-identically; no pow/ln.
    * Output: (rank, pair, merged, n, score). */
  def trainWordPiece(df: DataFrame, textCol: String,
      merges: Int): DataFrame = {
    val spark = df.sparkSession
    val base = df
      .select(explode(Dedup.words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .persist()
    try {
      trainHybrid(spark, base, merges, spaced, spacedLocal, wordPiece = true)
    } finally base.unpersist()
  }

  /** DuckDB replay of [[trainWordPiece]]: the shared CTE chain with the
    * score branch — an extra per-round unigram CTE and the score-ranked
    * argmax, the SAME two chained double divisions, same tie order. */
  def wordPieceOracleSql(table: String, merges: Int): String = {
    val out = (1 to merges).map(r =>
      s"SELECT $r AS rank, pair, replace(pair, ' ', '') AS merged, n, score FROM b$r")
      .mkString("\nUNION ALL ")
    // concatenated, never re-stripMargin'd (the '||'-continuation rule)
    oracleCtes(table, merges, scoreBy = true) + "\n" + out + "\nORDER BY rank"
  }

  /** (idCol, syms array<string>) — every document tokenized by the
    * merge table [[train]] learns on the same corpus: each word's
    * symbol string gets the full merge chain applied (same fixed-pass
    * replaces, rank order), then documents flatten their words' symbol
    * runs in order. One extra explode + per-doc bounded collect on top
    * of training. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame =
    encodeWith(df, idCol, textCol, merges, spaced, train)

  /** [[encode]] under a [[trainBytes]] vocabulary: byte-level symbol
    * sequences per document. */
  def encodeBytes(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame =
    encodeWith(df, idCol, textCol, merges, byteSpaced, trainBytes)

  /** [[encode]] under a [[trainWordPiece]] vocabulary: the merge TABLE
    * ranks by likelihood score instead of count, but applying it is the
    * same rank-ordered replace chain — one encodeWith call. Oracle:
    * [[encodeOracleSql]] with `scoreBy = true`. */
  def encodeWordPiece(df: DataFrame, idCol: String, textCol: String,
      merges: Int): DataFrame =
    encodeWith(df, idCol, textCol, merges, spaced, trainWordPiece)

  private def encodeWith(df: DataFrame, idCol: String, textCol: String,
      merges: Int, seed: Column => Column,
      trainer: (DataFrame, String, Int) => DataFrame): DataFrame = {
    val learned = trainer(df, textCol, merges).collect()
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[String]("pair"), r.getAs[String]("merged")))
      .toSeq
    // The merge chain is applied to the DISTINCT word table, segmented
    // every RoundsPerMaterialize merges (bounded plan depth, same reason
    // as trainRounds), then joined back onto the corpus — each word is
    // rewritten ONCE, not once per occurrence, which is also the oracle's
    // own shape (dw JOIN s<merges> USING (word)).
    var vocab = df
      .select(explode(Dedup.words(col(textCol))).as("word")).distinct()
      .select(col("word"), seed(col("word")).as("s"))
    learned.grouped(RoundsPerMaterialize).foreach { seg =>
      val next = vocab.select(col("word"), applyMerges(col("s"), seg).as("s"))
      if (seg.size >= RoundsPerMaterialize) {
        val t = Checkpoints.truncate(next)
        Checkpoints.discard(vocab) // materialized into t; never read again
        vocab = t
      } else vocab = next // final partial segment stays LAZY on vocab —
      // vocab must NOT be discarded here (the returned plan reads it)
    }
    df.select(col(idCol),
        posexplode(Dedup.words(col(textCol))).as(Seq("pos", "word")))
      .join(vocab, "word")
      .withColumn("syms", split(trim(col("s")), " "))
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("syms")))),
        x => x.getField("syms"))).as("syms"))
  }

  /** Oracle for [[encode]]: the training CTE chain's FINAL word→symbols
    * mapping joined back to the corpus, flattened in word order. */
  def encodeOracleSql(table: String, idCol: String, merges: Int,
      scoreBy: Boolean = false): String = {
    val duckWords =
      """list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"""
    // NOTE: concatenated, not one stripMargin — stripMargin over the
    // interpolated CTE text would eat the leading '|' of '||' lines.
    oracleCtes(table, merges, scoreBy = scoreBy) + ",\n" +
      s"""dw AS (SELECT $idCol, generate_subscripts(ws, 1) AS pos,
         |         unnest(ws) AS word
         |       FROM (SELECT $idCol, $duckWords AS ws FROM $table)),
         |enc AS (SELECT dw.$idCol, dw.pos,
         |          string_split(trim(s$merges.s), ' ') AS syms
         |        FROM dw JOIN s$merges USING (word))
         |SELECT $idCol, flatten(list(syms ORDER BY pos)) AS syms
         |FROM enc GROUP BY $idCol
         |ORDER BY $idCol""".stripMargin
  }

  /** The shared training CTE chain (w, s0, p1..b1..s1, …, s`merges`);
    * MATERIALIZED throughout — inlined CTEs would expand the chain
    * exponentially through the repeated argmax subqueries. */
  private def oracleCtes(table: String, merges: Int,
      textSql: String = "text", byteLevel: Boolean = false,
      scoreBy: Boolean = false): String = {
    val duckWords =
      s"""list_filter(string_split_regex(lower($textSql), '\\s+'), x -> x <> '')"""
    val rounds = (1 to merges).map { r =>
      val prev = if (r == 1) "s0" else s"s${r - 1}"
      val rep = (1 to MergePasses).foldLeft("s") { (acc, _) =>
        s"replace($acc, ' ' || (SELECT pair FROM b$r) || ' ', " +
          s"' ' || (SELECT replace(pair, ' ', '') FROM b$r) || ' ')"
      }
      // the round's argmax: raw count (BPE) or the WordPiece likelihood
      // score over an extra unigram CTE — one copy of everything else
      val pick = if (!scoreBy)
        s"b$r AS MATERIALIZED (SELECT pair, n FROM p$r ORDER BY n DESC, pair LIMIT 1)"
      else
        s"""u$r AS MATERIALIZED (SELECT sym, CAST(sum(cnt) AS BIGINT) AS u FROM (
           |  SELECT cnt, unnest(string_split(trim(s), ' ')) AS sym FROM $prev)
           |  GROUP BY 1),
           |b$r AS MATERIALIZED (SELECT pair, n,
           |    CAST(n AS DOUBLE) / CAST(lu.u AS DOUBLE) / CAST(ru.u AS DOUBLE)
           |      AS score
           |  FROM p$r
           |  JOIN u$r lu ON string_split(pair, ' ')[1] = lu.sym
           |  JOIN u$r ru ON string_split(pair, ' ')[2] = ru.sym
           |  ORDER BY score DESC, pair LIMIT 1)""".stripMargin
      s"""p$r AS MATERIALIZED (SELECT pair, CAST(sum(cnt) AS BIGINT) AS n FROM (
         |  SELECT cnt, unnest([sy[CAST(i AS INT)] || ' ' || sy[CAST(i AS INT)+1]
         |                      for i in range(1, len(sy))]) AS pair
         |  FROM (SELECT cnt, string_split(trim(s), ' ') AS sy FROM $prev))
         |  GROUP BY 1),
         |""".stripMargin + pick + s""",
         |s$r AS MATERIALIZED (SELECT word, cnt, $rep AS s FROM $prev)""".stripMargin
    }.mkString(",\n")
    // byte level: the seed symbol string maps each UTF-8 byte (two hex
    // digits of the encoded word) through the ByteUnicode table — the
    // same md5-hex digit arithmetic the simhash oracle uses
    val s0 = if (byteLevel) {
      val mapList = ByteUnicode
        .map(sym => "'" + sym.replace("'", "''") + "'")
        .mkString("[", ", ", "]")
      s"""s0 AS MATERIALIZED (SELECT word, cnt,
         |  ' ' || array_to_string([$mapList[
         |      (instr('0123456789abcdef', substr(h, 2*CAST(i AS INT)-1, 1))-1)*16
         |      + instr('0123456789abcdef', substr(h, 2*CAST(i AS INT), 1))]
         |    for i in range(1, length(h)//2 + 1)], ' ') || ' ' AS s
         |  FROM (SELECT word, cnt, lower(hex(encode(word))) AS h FROM w))"""
        .stripMargin
    } else {
      s"""s0 AS MATERIALIZED (SELECT word, cnt,
         |  ' ' || array_to_string([substr(word, CAST(i AS INT), 1)
         |                          for i in range(1, length(word)+1)], ' ')
         |      || ' ' AS s FROM w)""".stripMargin
    }
    // assembled by CONCATENATION, never an outer stripMargin: s0 and the
    // rounds are already margin-stripped, and re-stripping would eat the
    // leading '|' of any '||'-continuation line (the q_bpe_train binder
    // error this comment is the regression pin for)
    val head =
      s"""WITH w AS MATERIALIZED (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |  SELECT unnest($duckWords) AS word FROM $table) GROUP BY 1)"""
        .stripMargin
    head + ",\n" + s0 + ",\n" + rounds
  }

  /** DuckDB replay of [[trainBytes]]: the same chained-CTE rounds over
    * the byte-level seed; `textSql` lets the probe plant multi-byte
    * characters (the synthetic corpus is ASCII, where byte level would
    * degenerate to character level). */
  def bytesOracleSql(table: String, merges: Int,
      textSql: String = "text"): String = {
    val out = (1 to merges).map(r =>
      s"SELECT $r AS rank, pair, replace(pair, ' ', '') AS merged, n FROM b$r")
      .mkString("\nUNION ALL ")
    oracleCtes(table, merges, textSql, byteLevel = true) +
      "\n" + out + "\nORDER BY rank"
  }

  /** DuckDB replay: the same rounds as chained CTEs, same pass count. */
  def oracleSql(table: String, merges: Int): String = {
    val out = (1 to merges).map(r =>
      s"SELECT $r AS rank, pair, replace(pair, ' ', '') AS merged, n FROM b$r")
      .mkString("\nUNION ALL ")
    // concatenated for the same stripMargin-vs-'||' reason as above
    oracleCtes(table, merges) + "\n" + out + "\nORDER BY rank"
  }
}
