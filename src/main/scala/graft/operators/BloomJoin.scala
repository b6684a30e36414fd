package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftaccess.Internals

/** Bloom-filter pre-filtered join: build a bloom filter over the (small,
  * post-predicate) dim side's keys, drop fact rows that cannot match
  * BEFORE the join's exchange, then run the exact join.
  *
  * This is the manual form of Spark's own runtime-filter rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.*`, which only fires on
  * selective-join patterns the optimizer recognizes): at 100 TB the
  * dominant cost of a selective fact⋈dim join is shuffling fact rows
  * that the dim's WHERE clause was always going to discard — a few-MB
  * bloom filter broadcast to the scan stage removes them at the source,
  * pushing the selectivity of the dim predicate onto the fact scan. False
  * positives only cost wasted shuffle bytes; the exact join keeps the
  * result identical to the plain join. Uses Spark's own
  * [[BloomFilterAggregate]]/[[BloomFilterMightContain]] (codegen'd,
  * xxhash64-keyed) rather than reinventing the sketch.
  */
object BloomJoin {

  /** Bloom filter over `key` as a one-row aggregate Column (binary). */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    Internals.column(new BloomFilterAggregate(
        new XxHash64(Seq(Internals.expression(key))), expectedItems)
      .toAggregateExpression())

  /** `might_contain(bloom, xxhash64(key))` — the probe-side predicate. */
  def mightContain(bloom: Column, key: Column): Column =
    Internals.column(new BloomFilterMightContain(
      Internals.expression(bloom),
      new XxHash64(Seq(Internals.expression(key)))))

  /** The bloom probe as a fact-side predicate Column: `might_contain`
    * demands its bloom input be a constant or scalar subquery (it is
    * evaluated per fact row inside the scan stage), so the dim-side
    * aggregate rides in as a [[ScalarSubquery]] — one tiny subquery job
    * whose binary result is inlined before the fact scan runs, exactly
    * how Spark's own `InjectRuntimeFilter` shapes it. */
  def bloomProbe(factKey: Column, dim: DataFrame, dimKey: String,
      expectedItems: Long): Column = {
    val bfPlan = Internals.analyzedPlan(
      dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bf")))
    Internals.column(new BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(bfPlan),
      new XxHash64(Seq(Internals.expression(factKey)))))
  }

  /** `fact ⋈ dim` on `factKey = dimKey`, with the fact side pre-filtered
    * by a bloom filter of the dim keys. Result-identical to the plain
    * inner join; the fact rows that survive to the join exchange shrink
    * by the dim predicate's selectivity (modulo the false-positive
    * rate, ~3% at the default sizing). */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1L << 20): DataFrame = {
    val pruned = fact.where(
      bloomProbe(col(factKey), dim, dimKey, expectedItems))
    pruned.alias("f").join(dim.alias("d"),
      col(s"f.$factKey") === col(s"d.$dimKey"))
  }
}
