package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution statistics beyond Spark's builtin aggregates.
  * [[exactWeightedPercentile]] covers DataFusion's
  * `approx_percentile_cont_with_weight` (SURVEY §2.9 ⚠) with exact
  * semantics: the smallest value whose cumulative weight reaches
  * p × total. One window pass per group — no driver collection, scales
  * with the group-by shuffle. */
object Stats {

  /** Per-group exact weighted percentile. `tieBreak` columns make the
    * cumulative order (and hence the result) deterministic when values
    * repeat. */
  def exactWeightedPercentile(
      df: DataFrame, groupCol: String, valueCol: String, weightCol: String,
      p: Double, tieBreak: Seq[String]): DataFrame = {
    val order = (col(valueCol) +: tieBreak.map(col)).map(_.asc)
    val cum = Window.partitionBy(col(groupCol)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = Window.partitionBy(col(groupCol))
    df.select(col(groupCol), col(valueCol),
        sum(col(weightCol)).over(cum).as("__cw"),
        sum(col(weightCol)).over(total).as("__tw"))
      .filter(col("__cw") >= lit(p) * col("__tw"))
      .groupBy(col(groupCol))
      .agg(min(col(valueCol)).as(s"wp"))
  }
}

/** Skew mitigation: salted broadcast-style join for hot keys. The large
  * side gets a uniform salt; the small side is exploded across all salt
  * values, so one hot key fans out over `salt` reducers instead of one.
  * Result is identical to the unsalted equi-join (inner). */
object SkewJoin {
  def saltedInnerJoin(
      large: DataFrame, small: DataFrame, key: String,
      salt: Int): DataFrame = {
    require(salt > 0)
    val salted = large.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1))))
    salted.join(exploded,
        salted("__salt") === exploded("__salt") &&
          salted(key) === exploded(key))
      .drop("__salt")
  }
}
