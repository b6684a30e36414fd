package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Sequence packing — assembling documents into fixed token-budget bins
  * (context windows) for training-batch construction. Two tiers:
  *
  *  - [[packByCumsum]]: bin = floor(running-token-total / budget) over a
  *    deterministic document order. One window over the ordering key —
  *    declarative, cross-engine checkable (the probe oracle recomputes
  *    the identical cumulative sum in DuckDB), and the standard
  *    "pack with boundary straddling" used when a tokenizer can split
  *    documents across windows.
  *  - [[packGreedyPerPartition]]: first-fit greedy within each partition
  *    (documents never straddle bins; a bin closes when the next doc
  *    would overflow). Sequential by nature, so it runs as per-partition
  *    imperative logic over a deterministic range partitioning — each
  *    partition packs its own id-sorted run independently, which is how
  *    a 1000-executor packing job actually shards (bins never span
  *    executors). Invariants spec-tested: every doc packed exactly once,
  *    no bin exceeds the budget unless a single oversized doc owns it.
  */
object Packing {

  /** Window-based packing: documents ordered by `orderCol`; bin id =
    * how many full budgets precede the document's first token. Output:
    * input columns + `bin` (0-based) + `cum_tokens` (inclusive). */
  def packByCumsum(df: DataFrame, orderCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    val w = Window.orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokensCol)).over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col(tokensCol)) / budget).cast("bigint"))
  }

  /** Greedy first-fit packing within each range partition of `orderCol`.
    * Output: (orderCol value, tokens, partition, bin-within-partition).
    * Deterministic for a fixed `numPartitions`. */
  def packGreedyPerPartition(df: DataFrame, orderCol: String,
      tokensCol: String, budget: Long, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(orderCol).cast("long").as("doc"),
        col(tokensCol).cast("long").as("tokens"))
      .repartitionByRange(numPartitions, col("doc"))
      .sortWithinPartitions("doc")
    val outSchema = StructType(Seq(
      StructField("doc", LongType, nullable = false),
      StructField("tokens", LongType, nullable = false),
      StructField("part", IntegerType, nullable = false),
      StructField("bin", LongType, nullable = false)))
    val packed = in.rdd.mapPartitionsWithIndex { (pid, rows) =>
      var bin = 0L
      var used = 0L
      rows.map { r =>
        val doc = r.getLong(0)
        val tokens = r.getLong(1)
        if (used > 0 && used + tokens > budget) { bin += 1; used = 0L }
        used += tokens
        Row(doc, tokens, pid, bin)
      }
    }
    spark.createDataFrame(packed, outSchema)
  }
}
