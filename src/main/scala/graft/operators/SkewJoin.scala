package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for key skew.
  *
  * A shuffled hash/sort-merge join sends every row of a key to ONE
  * reducer; a whale key (a few % of a 100 TB fact table hitting one
  * supplier/user/document) turns that reducer into the job's critical
  * path while the other 999 executors idle. Salting splits each key's
  * rows across `salts` reducers: the big side gets a per-row salt in
  * [0, salts), the small side is replicated `salts`× so every (key,
  * salt) pair it owns exists, and the join adds the salt to the key —
  * same result set, `salts`-way parallel whales. The price is
  * replicating the small side, which is why this is a targeted tool
  * (AQE's skew-join handles sort-merge skew automatically at runtime;
  * salting is the explicit, planner-independent form that also covers
  * hash joins and pre-AQE engines).
  *
  * Join types: "inner" and "left" (big side preserved). Right/full
  * would emit one copy of an unmatched small row PER SALT — refused.
  */
object SkewJoin {

  /** Join `big` with `small` on `keys` (bigCol → smallCol pairs), salted
    * `salts` ways. The salt is derived from a per-row id, so whale-key
    * rows spread uniformly regardless of input partitioning; it never
    * affects the result, only the shuffle distribution. */
  def saltedJoin(big: DataFrame, small: DataFrame,
      keys: Seq[(String, String)], salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 2, s"salts must be >= 2, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"salted join preserves the BIG side only: inner/left, got $joinType")
    val b = big.withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)))
      .alias("b")
    val s = small.withColumn("__salt",
        explode(sequence(lit(0L), lit(salts.toLong - 1)))).alias("s")
    val cond = keys.map { case (bk, sk) => col(s"b.$bk") === col(s"s.$sk") }
      .reduce(_ && _) && col("b.__salt") === col("s.__salt")
    b.join(s, cond, joinType)
      .drop(col("b.__salt")).drop(col("s.__salt"))
  }

  /** [[saltedJoin]] with PER-KEY salt factors derived from
    * [[Stats.skewProfile]] instead of one manual constant (VERDICT r12
    * #5 — ends guess-the-constant tuning): each of the big side's top-K
    * heaviest keys is split across exactly the number of average-
    * partition units it occupies (its profile `salt`), every other key
    * stays UNSALTED — whales spread, uniform keys pay zero replication.
    *
    * Fully plan-composed, no driver collect: the profile is one
    * map-side-combined count aggregate over the big side ending in a
    * `topK`-row broadcast, left-joined onto both relations as the salt-
    * factor lookup (missing → 1). The small side replicates each row
    * `factor` times ONLY for its whale keys, vs `salts`× for every row
    * in the manual form — at 100 TB the replication cost collapses from
    * |small|·salts to |small ∩ whales|·factor. The extra profile pass
    * is one scan of big's key column; AQE handles the broadcast. Same
    * result set as the plain join (probe-checked); inner/left only. */
  def saltedJoinAuto(big: DataFrame, small: DataFrame,
      keys: Seq[(String, String)], topK: Int = 1000,
      joinType: String = "inner", partitions: Int = 0): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"salted join preserves the BIG side only: inner/left, got $joinType")
    require(keys.nonEmpty, "at least one join key required")
    val parts = if (partitions > 0) partitions
      else OpConf.shufflePartitions(big)
    val bigKeys = keys.map(_._1)
    // The factors table carries the big side's TYPED key columns, and
    // BOTH relations look their factor up through the SAME equality the
    // real join uses -- never a per-side string rendering, which can
    // disagree across key types ("7.0" vs "7" for DOUBLE vs INT keys)
    // while the join's own coercion still matches; a whale whose small
    // side missed the broadcast would silently lose ~(1 - 1/factor) of
    // its matches (round-13 review). Same ceil(cnt*parts/total) factor
    // derivation as Stats.skewProfile, DECIMAL-widened identically.
    val counts = big.groupBy(bigKeys.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum("__cnt").as("__total"))
    val factors = counts
      .orderBy(col("__cnt").desc +: bigKeys.map(col(_).asc): _*)
      .limit(topK)
      .crossJoin(broadcast(total))
      .select(bigKeys.map(col) :+
        Stats.saltFactorExpr("__cnt", "__total", parts).as("__salts"): _*)
      .where(col("__salts") >= 2L)
      .alias("f")
    val b0 = big.alias("b0")
    val bCond = bigKeys
      .map(bk => col(s"b0.$bk") <=> col(s"f.$bk")).reduce(_ && _)
    val b = b0.join(broadcast(factors), bCond, "left")
      .select(col("b0.*") +:
        coalesce(col("f.__salts"), lit(1L)).as("__salts") +: Nil: _*)
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), col("__salts")))
      .alias("b")
    val s0 = small.alias("s0")
    val sCond = keys
      .map { case (bk, sk) => col(s"s0.$sk") === col(s"f.$bk") }
      .reduce(_ && _)
    val s = s0.join(broadcast(factors), sCond, "left")
      .select(col("s0.*") +:
        coalesce(col("f.__salts"), lit(1L)).as("__salts") +: Nil: _*)
      .withColumn("__salt", explode(sequence(lit(0L), col("__salts") - 1)))
      .alias("s")
    val cond = keys.map { case (bk, sk) => col(s"b.$bk") === col(s"s.$sk") }
      .reduce(_ && _) && col("b.__salt") === col("s.__salt")
    b.join(s, cond, joinType)
      .drop(col("b.__salt")).drop(col("s.__salt"))
      .drop(col("b.__salts")).drop(col("s.__salts"))
  }
}
