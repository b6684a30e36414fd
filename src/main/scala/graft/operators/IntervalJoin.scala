package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join via temporal binning.
  *
  * The declarative form — `a.s <= b.e AND b.s <= a.e` — has no equi-key,
  * so Spark plans a BroadcastNestedLoopJoin (or a cartesian product when
  * neither side fits in a broadcast): O(|A|·|B|) comparisons, the classic
  * 100 TB cliff. Binning restores an equi-key: floor both interval
  * endpoints to `bin`-sized buckets, explode each interval to one row per
  * covered bucket (`sequence`), equi-join on the bucket, then re-check
  * the exact overlap predicate and dedup pairs that met in several
  * buckets. Cost: each interval is replicated ~len/bin + 1 times and the
  * join is an ordinary hash-partitioned shuffle — pick `bin` near the
  * typical interval length so replication stays O(1) per row (the same
  * sizing rule as spatial grid joins and Flink's interval-join buckets).
  *
  * Closed-interval semantics; endpoints are plain longs (epoch micros in
  * the probes — integer math only, so the DuckDB oracle's theta join
  * agrees bit-for-bit).
  */
object IntervalJoin {

  /** Floor division to bucket ids: bare `div` truncates toward zero,
    * which mis-buckets negative coordinates. a - pmod(a, bin) is the
    * largest multiple of bin ≤ a, and `div` on that multiple is exact
    * integer math for any sign (no double rounding past 2^53). */
  private[graft] def fdiv(name: String, bin: Long): org.apache.spark.sql.Column =
    expr(s"(($name - pmod($name, ${bin}L)) div ${bin}L)")

  private[graft] def binned(df: DataFrame, id: String, s: String, e: String,
      oid: String, os: String, oe: String, bin: Long): DataFrame =
    df.select(col(id).as(oid), col(s).as(os), col(e).as(oe))
      .where(col(os) <= col(oe))
      .withColumn("__bk", explode(sequence(fdiv(os, bin), fdiv(oe, bin))))

  /** Overlapping (ida, idb) pairs with both intervals' bounds.
    * `a`/`b` must expose (idA, sA, eA) / (idB, sB, eB) as long-typed
    * columns; every id appears once per OVERLAPPING partner.
    *
    * Cross-bucket dedup is FREE: a pair is emitted only from its
    * canonical bucket — the bucket of the later start,
    * `greatest(fdiv(sa), fdiv(sb))`, which two overlapping intervals
    * always share (overlap ⇒ max(sa,sb) ≤ min(ea,eb), so that start's
    * bucket is inside both exploded ranges). One equi-join shuffle, no
    * post-join aggregate — at 100 TB the old groupBy dedup re-shuffled
    * every candidate pair; this emits each exactly once. */
  def overlapPairs(a: DataFrame, idA: String, sA: String, eA: String,
      b: DataFrame, idB: String, sB: String, eB: String,
      bin: Long): DataFrame = {
    require(bin > 0, "bin width must be positive")
    val ax = binned(a, idA, sA, eA, "ida", "sa", "ea", bin)
    val bx = binned(b, idB, sB, eB, "idb", "sb", "eb", bin)
    ax.join(bx, Seq("__bk"))
      .where(col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("__bk") === greatest(fdiv("sa", bin), fdiv("sb", bin)))
      .select(col("ida"), col("idb"), col("sa"), col("ea"),
        col("sb"), col("eb"))
  }
}
