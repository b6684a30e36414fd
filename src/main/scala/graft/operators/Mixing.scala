package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Source mixing for training-data assembly: sample each source to a
  * temperature-scaled share of a document budget — w_s ∝ n_s^α with
  * α < 1 upsampling tail sources (the standard multilingual/multi-corpus
  * mixing recipe, e.g. the α=0.3 exponent family popularized by
  * multilingual BERT/XLM-R; builder-prompt extension surface).
  *
  * Determinism contract (same trick as [[Similarity.kmeansFit]]):
  * per-source weights are QUANTIZED to int64 (round(n^α · 2^20)), summed
  * exactly, and each take count is floor(budget · w_q / Σw_q) — one
  * correctly-rounded IEEE division per source. α = 0.5 routes through
  * hardware sqrt (correctly rounded, unlike pow), so the DuckDB oracle
  * reproduces every take count bit-for-bit. Per-document selection is
  * rank-by-md5 — no float compares at the row level at all.
  */
object Mixing {

  /** (source, takeCount) from (source, rowCount): w = round(n^α·2^20),
    * take = floor(budget · w / Σw). Input order does not matter (integer
    * sum is associative). */
  def temperatureTakes(counts: Seq[(String, Long)], alpha: Double,
      budget: Long, quantBits: Int = 20): Seq[(String, Long)] = {
    val scale = (1L << quantBits).toDouble
    val wq = counts.map { case (s, n) =>
      val w = if (alpha == 0.5) math.sqrt(n.toDouble)
        else math.pow(n.toDouble, alpha)
      s -> math.round(w * scale)
    }
    val tot = wq.map(_._2).sum
    wq.map { case (s, w) =>
      s -> math.floor(budget.toDouble * w.toDouble / tot.toDouble).toLong
    }
  }

  /** Exact-take mix: per source, the first `take` documents in md5 order.
    * One count aggregate (k rows to the driver — the same bounded driver
    * traffic as any Lloyd round) + one window shuffle keyed on source.
    * A whale source serializes its rank into one task — at 100 TB prefer
    * [[hashMix]], which trades exact take sizes for zero shuffle. */
  def exactMix(df: DataFrame, idCol: String, srcCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val takes = sourceTakes(df, srcCol, alpha, budget)
    val takeCol = takes.foldRight(lit(0L): Column) { case ((s, t), els) =>
      when(col(srcCol) === s, lit(t)).otherwise(els)
    }
    val w = Window.partitionBy(col(srcCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rnk", row_number().over(w))
      .filter(col("__rnk") <= takeCol)
      .select(col(idCol), col(srcCol))
  }

  /** Scale-path mix: keep a document iff its 60-bit md5 value falls under
    * the source's sampling fraction take/n — a pure projection (zero
    * shuffle, partition-invariant), with take sizes exact in expectation
    * instead of exactly met. The spec pins the tolerance. */
  def hashMix(df: DataFrame, idCol: String, srcCol: String, alpha: Double,
      budget: Long): DataFrame = {
    val fracs = sourceFracs(df, srcCol, alpha, budget)
    val fracCol = fracs.foldRight(lit(0.0): Column) {
      case ((s, t), els) => when(col(srcCol) === s, lit(t)).otherwise(els)
    }
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    df.filter(h.cast("double") / (1L << 60).toDouble < fracCol)
      .select(col(idCol), col(srcCol))
  }

  private def sourceTakes(df: DataFrame, srcCol: String, alpha: Double,
      budget: Long): Seq[(String, Long)] = {
    val counts = df.groupBy(col(srcCol)).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    temperatureTakes(counts, alpha, budget)
  }

  private def sourceFracs(df: DataFrame, srcCol: String, alpha: Double,
      budget: Long): Seq[(String, Double)] = {
    val counts = df.groupBy(col(srcCol)).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    val takes = temperatureTakes(counts, alpha, budget).toMap
    counts.map { case (s, n) =>
      s -> math.min(1.0, takes(s).toDouble / n.toDouble)
    }
  }

  /** LOSS-DRIVEN domain reweighting by multiplicative weights (Arora/
    * Hazan/Kale, "The Multiplicative Weights Update Method", Theory of
    * Computing 2012 — the hashable cousin of DoReMi's exponentiated-
    * gradient domain mixture, Xie et al. 2023): domains whose documents
    * a reference LM finds HARD (high perplexity = excess loss) get their
    * mixture weight multiplied up each round, w ← w·(1 + η·excess),
    * then normalized — the training-mix optimizer a 100 TB pipeline
    * runs between [[temperatureTakes]]-style count scaling and the
    * actual sample.
    *
    * Exactness: the per-domain signal is the EXACT integer mean
    * quantized bigram probability ([[LmScore]] sum_qp DIV n_bigrams,
    * aggregated per domain with integer sums), excess = (bestAvg −
    * avg_d)/2^30 — one IEEE division; each round is one multiply-add
    * per domain plus a normalization whose sum folds in DOMAIN-NAME
    * order — every step correctly-rounded on identical operands, so
    * the unrolled-CTE DuckDB replay is bit-identical (the
    * probability-product recipe; exp() would diverge cross-engine).
    * The fold itself is driver-side over ONE model-sized row per domain
    * (the kmeans-centroid contract); the data passes are the LM scoring
    * aggregates. Output: (domain, avg_q, excess, weight) after `rounds`.
    */
  def domainReweight(df: DataFrame, idCol: String, textCol: String,
      srcCol: String, eta: Double = 0.5, rounds: Int = 5): DataFrame = {
    require(eta > 0.0 && rounds >= 1, s"need eta>0, rounds>=1; got $eta, $rounds")
    val spark = df.sparkSession
    val (uni, bi, tot) = LmScore.bigramModel(df, idCol, textCol)
    val perDoc = LmScore.score(df, idCol, textCol, uni, bi, tot)
    // LEFT join: a domain whose documents are ALL unscorable (< 2
    // tokens) must still appear — with the perplexityBuckets sentinel
    // avg_q = −1 it reads as maximally hard and gets upweighted, never
    // silently dropped from the normalization (round-13 review). The
    // domain sums are DECIMAL(38,0)-widened BEFORE aggregation: per-doc
    // sum_qp ≈ n_bigrams·2^30, so a ~40 GB domain would wrap an int64
    // sum (the same overflow class skewProfile hardened against).
    val perDomain = df.select(col(idCol), col(srcCol).as("__dom"))
      .join(perDoc, Seq(idCol), "left")
      .groupBy("__dom")
      .agg(sum(col("sum_qp").cast("decimal(38,0)")).as("sq"),
        sum(col("n_bigrams").cast("decimal(38,0)")).as("nb"))
      .select(col("__dom"),
        expr("CAST(coalesce(sq DIV nb, -1) AS BIGINT)").as("avg_q"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      // the normalization fold order — fixed by name in UTF-8 BYTE
      // order (UTF8String.compareTo = Spark's sort = DuckDB's binary
      // `ORDER BY domain`; Java String.compareTo orders supplementary
      // characters differently and must not decide the fold). A NULL
      // domain is real data (the language-ID-failure stance of
      // LmScore.perplexityBucketsHist): it sorts LAST, matching the
      // oracle's default NULLS-LAST `list(w ORDER BY domain)`, instead
      // of NPE-ing String ordering (ADVICE r13).
      .sortWith { case ((a, _), (b, _)) =>
        if (a == null) false
        else if (b == null) true
        else OpConf.utf8Lt(a, b)
      }
    require(perDomain.nonEmpty, "no domains in input")
    val best = perDomain.map(_._2).max
    val scale = (1L << 30).toDouble
    val excess = perDomain.map { case (d, a) =>
      (d, a, (best - a).toDouble / scale)
    }
    var w = excess.map(_ => 1.0)
    (1 to rounds).foreach { _ =>
      val up = w.zip(excess).map { case (wi, (_, _, x)) => wi * (1.0 + eta * x) }
      val norm = up.reduceLeft(_ + _)
      w = up.map(_ / norm)
    }
    spark.createDataFrame(excess.zip(w).map { case ((d, a, x), wi) =>
      (d, a, x, wi)
    }).toDF("domain", "avg_q", "excess", "weight")
  }

  /** DuckDB replay of [[domainReweight]]: the LM chain per domain, the
    * integer DIV mean, and `rounds` unrolled multiplicative-weight CTEs
    * whose normalization sums list_reduce in domain-name order. */
  def domainReweightOracleSql(table: String, idCol: String,
      srcCol: String, eta: Double = 0.5, rounds: Int = 5): String = {
    val one = "CAST(1.0 AS DOUBLE)"
    val e = s"CAST($eta AS DOUBLE)"
    val roundCtes = (1 to rounds).map { t =>
      val p = if (t == 1) "d0" else s"w${t - 1}"
      s"""u$t AS (SELECT domain, w * ($one + $e * x) AS w, x FROM $p),
         |n$t AS (SELECT list_reduce(list(w ORDER BY domain),
         |    (a, b) -> a + b) AS s FROM u$t),
         |w$t AS (SELECT domain, u$t.w / n$t.s AS w, x FROM u$t, n$t)"""
        .stripMargin
    }.mkString(",\n")
    // concatenated (never re-stripMargin'd) around the ONE shared copy
    // of the LM scoring chain
    "WITH " + LmScore.selfScoreCtes(table, idCol) + ",\n" +
      s"""dom AS (SELECT t.$srcCol AS domain,
         |    CAST(coalesce(sum(sc.sq) // sum(sc.nb), -1) AS BIGINT) AS avg_q
         |  FROM (SELECT $idCol, $srcCol FROM $table) t
         |  LEFT JOIN sc USING ($idCol) GROUP BY 1),
         |bst AS (SELECT max(avg_q) AS b FROM dom),
         |d0 AS (SELECT domain, avg_q,
         |    CAST(bst.b - avg_q AS DOUBLE) / CAST(1073741824 AS DOUBLE) AS x,
         |    $one AS w
         |  FROM dom, bst),""".stripMargin + "\n" + roundCtes + "\n" +
      s"""SELECT d0.domain, d0.avg_q, d0.x AS excess, wr.w AS weight
         |FROM d0 JOIN w$rounds wr
         |  ON d0.domain IS NOT DISTINCT FROM wr.domain
         |ORDER BY d0.domain""".stripMargin
    // the join is NULL-SAFE so a NULL domain row survives the replay
    // (USING (domain) would silently drop it — third-review finding);
    // note a composition that carries NULL domains must also align the
    // two engines' ORDER BY null placement (DuckDB last, Spark first).
  }

  /** DuckDB replay of [[exactMix]] (α = 0.5 — hardware sqrt is correctly
    * rounded, so both engines compute identical quantized weights). */
  def exactMixOracleSql(table: String, idCol: String, srcCol: String,
      budget: Long, quantBits: Int = 20): String = {
    val scale = s"${1L << quantBits}.0"
    s"""WITH c AS (SELECT $srcCol, count(*) AS n FROM $table GROUP BY $srcCol),
       |w AS (SELECT $srcCol,
       |        CAST(round(sqrt(CAST(n AS DOUBLE)) * $scale) AS BIGINT) AS wq
       |      FROM c),
       |tk AS (SELECT $srcCol,
       |         CAST(floor(($budget.0 * wq) /
       |           CAST((SELECT sum(wq) FROM w) AS DOUBLE)) AS BIGINT) AS t
       |       FROM w),
       |r AS (SELECT $idCol, $srcCol,
       |        row_number() OVER (PARTITION BY $srcCol
       |          ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS rnk
       |      FROM $table)
       |SELECT r.$idCol, r.$srcCol FROM r JOIN tk USING ($srcCol)
       |WHERE rnk <= t
       |ORDER BY r.$idCol""".stripMargin
  }
}
