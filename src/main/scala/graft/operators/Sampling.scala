package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Both operators are hash-deterministic rather than RNG-seeded: the SAME
  * row lands in the same split/sample on any cluster size, after any
  * repartition, in any engine that can compute md5 — which is what makes
  * them reproducible across reruns of a 100 TB pipeline AND cross-checkable
  * against the DuckDB oracle (both engines print identical lowercase md5
  * hex, the same trick [[Dedup.simhashMd5Bands]] uses).
  *
  *  - [[hashSplit]] is a pure projection: zero shuffle, zero state.
  *  - [[stratifiedSampleN]] runs on the bounded-heap
  *    [[graft.plans.TopK]] operator: one exchange on the stratum key and
  *    O(n) heap memory per stratum — never a full per-stratum sort.
  */
object Sampling {

  /** Deterministic md5 bucket of an id: first-8-hex md5 digits mod
    * `numBuckets` — the shared deal used by [[graft.operators.ShardExport]]
    * and [[Coreset.kCenterSharded]]. Replay in DuckDB with
    * [[duckMd5Bucket]]. */
  def md5Bucket(id: Column, numBuckets: Int): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(numBuckets.toLong))

  /** DuckDB replay of [[md5Bucket]] over SQL expression `idExpr`: parse
    * the first 8 md5 hex digits via instr/shift-sum (DuckDB has no
    * hex-string-to-int conv), then mod. Keep THIS one copy — the recipe
    * is exactness-critical and easy to drift. */
  def duckMd5Bucket(idExpr: String, numBuckets: Int): String = {
    val hex8 = "CAST(list_sum(list_transform(range(8), k -> " +
      s"CAST(instr('0123456789abcdef', substr(md5(CAST($idExpr AS VARCHAR)), " +
      "CAST(k AS INT)+1, 1)) - 1 AS BIGINT) << CAST(4*(7-k) AS BIGINT))) " +
      "AS BIGINT)"
    s"$hex8 % $numBuckets"
  }

  /** 4-hex-digit cumulative upper bounds for the leading fractions (the
    * last split takes the remainder, so no bound is emitted for it). */
  def hexBounds(fractions: Seq[Double]): Seq[String] = {
    val cum = fractions.scanLeft(0.0)(_ + _).tail
    cum.init.map(f => f"${math.min((f * 65536).round, 65535L)}%04x")
  }

  /** Deterministic train/val/test split: label each row by comparing the
    * first 4 hex chars of md5(id) against the cumulative fraction
    * boundaries. Granularity is 1/65536 — at training-corpus sizes the
    * realized fractions converge to the requested ones. */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)]): DataFrame = {
    require(fractions.size >= 2, "need at least two splits")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "fractions must sum to 1")
    val bounds = hexBounds(fractions.map(_._2))
    val h = substring(md5(col(idCol).cast("string")), 1, 4)
    val label = fractions.init.zip(bounds)
      .foldRight(lit(fractions.last._1): Column) {
        case (((name, _), b), els) => when(h < lit(b), lit(name)).otherwise(els)
      }
    df.withColumn("split", label)
  }

  /** DuckDB CASE expression computing the identical split label. */
  def hashSplitOracleCase(idExpr: String,
      fractions: Seq[(String, Double)]): String = {
    val bounds = hexBounds(fractions.map(_._2))
    val h = s"substr(md5(CAST($idExpr AS VARCHAR)), 1, 4)"
    val whens = fractions.init.zip(bounds)
      .map { case ((n, _), b) => s"WHEN $h < '$b' THEN '$n'" }
      .mkString(" ")
    s"CASE $whens ELSE '${fractions.last._1}' END"
  }

  /** Uniform k-of-n sampling without replacement — the deterministic
    * equivalent of reservoir sampling: rank rows by md5(id) (a uniform
    * permutation of the ids) and keep the first k. Unlike a sequential
    * reservoir, the same rows are selected on any cluster size and by
    * the DuckDB oracle; the plan is TakeOrderedAndProject (O(k) heap per
    * partition), never a global sort. Equals [[prioritySample]] with all
    * weights equal, minus the division. */
  def uniformSample(df: DataFrame, idCol: String, k: Int): DataFrame =
    df.withColumn("__hv", md5(col(idCol).cast("string")))
      .orderBy(col("__hv"), col(idCol))
      .limit(k)
      .drop("__hv")

  /** Weight-proportional sampling without replacement via priority
    * sampling (Duffield/Lund/Thorup, "Priority sampling for estimation
    * of arbitrary subset sums", JACM 54(6), 2007): each row gets
    * priority q = w/u with u uniform in (0,1], and the k highest
    * priorities are kept — heavy rows are near-certain picks, light rows
    * enter with probability ∝ w.
    *
    * Deterministic and cross-engine exact: u comes from the 52-bit md5
    * prefix of the id, u = (h+1)/2^52 (a power-of-two divide of a
    * ≤52-bit integer — exact in IEEE), and w/u is one correctly-rounded
    * division — so Spark and the DuckDB oracle select bit-identical
    * priorities. No ln/pow anywhere (those are NOT correctly rounded and
    * would drift across engines).
    *
    * Scale shape: priority is a pure projection; the top-k plans as
    * TakeOrderedAndProject — an O(k) heap per partition + O(k) merge on
    * the driver, never a full sort. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    val h = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("bigint")
    val u = (h + lit(1)).cast("double") / lit(4503599627370496.0) // 2^52
    df.withColumn("priority", col(weightCol).cast("double") / u)
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
  }

  /** DuckDB expression replaying [[prioritySample]]'s priority for
    * `idExpr`/`weightExpr` (hex-prefix parse via shift-sum, the same
    * list-comprehension trick the simhash oracle uses). */
  def priorityOracleExpr(idExpr: String, weightExpr: String): String = {
    val h = "list_sum([ (CAST(strpos('0123456789abcdef', " +
      s"substr(md5(CAST($idExpr AS VARCHAR)), CAST(i AS INT), 1)) AS BIGINT) - 1) " +
      "<< CAST(4*(13 - i) AS BIGINT) for i in range(1, 14) ])"
    s"CAST($weightExpr AS DOUBLE) / (($h + 1) / 4503599627370496.0)"
  }

  /** Exactly min(n, |stratum|) rows per stratum, selected by
    * deterministic hash order (md5 of the id, id tiebreak). Output keeps
    * the input columns plus `rn` (1-based rank within the stratum). */
  def stratifiedSampleN(df: DataFrame, strataCol: String, idCol: String,
      n: Int): DataFrame =
    graft.plans.TopK.perKey(
        df.withColumn("__hv", md5(col(idCol).cast("string"))),
        Seq(strataCol), Seq(("__hv", true), (idCol, true)), n,
        rankName = "rn")
      .drop("__hv")
}
