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
    // one string key expression, applied identically on both sides (the
    // profile's own type-uniform cast); composite keys concatenate with
    // an unprintable separator
    def keyOf(cols: Seq[String]): Column =
      if (cols.size == 1) col(cols.head).cast("string")
      else concat_ws("\u0001", cols.map(c => col(c).cast("string")): _*)
    val bigK = big.withColumn("__skkey", keyOf(keys.map(_._1)))
    val factors = Stats
      .skewProfile(bigK, "__skkey", topK, parts)
      .where(col("salt") >= 2)
      .select(col("key").as("__skkey"), col("salt").cast("long").as("__salts"))
    val b = bigK.join(broadcast(factors), Seq("__skkey"), "left")
      .withColumn("__salts", coalesce(col("__salts"), lit(1L)))
      .withColumn("__salt",
        pmod(xxhash64(monotonically_increasing_id()), col("__salts")))
      .alias("b")
    val s = small.withColumn("__skkey", keyOf(keys.map(_._2)))
      .join(broadcast(factors), Seq("__skkey"), "left")
      .withColumn("__salts", coalesce(col("__salts"), lit(1L)))
      .withColumn("__salt", explode(sequence(lit(0L), col("__salts") - 1)))
      .alias("s")
    val cond = keys.map { case (bk, sk) => col(s"b.$bk") === col(s"s.$sk") }
      .reduce(_ && _) && col("b.__salt") === col("s.__salt")
    b.join(s, cond, joinType)
      .drop(col("b.__salt")).drop(col("s.__salt"))
      .drop(col("b.__salts")).drop(col("s.__salts"))
      .drop(col("b.__skkey")).drop(col("s.__skkey"))
  }
}
