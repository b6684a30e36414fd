package graft.operators

import org.apache.spark.sql.DataFrame
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
}
