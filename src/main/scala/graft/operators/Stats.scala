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

  /** One-pass data profile: per column, min / max (rendered as strings
    * so one result schema fits every column type), null count, distinct
    * count, and the table row count — DuckDB's SUMMARIZE for an
    * arbitrary DataFrame. ONE global aggregate job computes all 4·n
    * aggregates (partial → final, no shuffle of data rows — the shuffle
    * carries a single aggregation buffer per partition), then a `stack`
    * unpivots the 1×(4n+1) row to n rows. At 100 TB this is the shape a
    * profiler must have: a single scan, no per-column jobs, no driver
    * loop over columns.
    *
    * `exactDistinct = false` (the scale default) uses HLL
    * approx_count_distinct; `true` uses exact multi-DISTINCT (Spark
    * plans one Expand — still a single scan, n× the aggregate input),
    * which cross-engine probes need because HLL sketches differ between
    * engines. */
  def profile(df: DataFrame, exactDistinct: Boolean = false): DataFrame = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val c = col(f.name)
      Seq(
        min(c).cast("string").as(s"${f.name}__min"),
        max(c).cast("string").as(s"${f.name}__max"),
        (count(lit(1)) - count(c)).as(s"${f.name}__nulls"),
        (if (exactDistinct) count_distinct(c)
         else approx_count_distinct(c)).as(s"${f.name}__distinct"))
    } :+ count(lit(1)).as("__n")
    val entries = fields.map { f =>
      val q = f.name.replace("`", "``")
      s"'${f.name.replace("'", "''")}', `${q}__min`, `${q}__max`, " +
        s"`${q}__nulls`, `${q}__distinct`, `__n`"
    }
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${fields.size}, ${entries.mkString(", ")}) AS " +
        "(column_name, min_value, max_value, null_count, n_distinct, n_rows)")
  }

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
