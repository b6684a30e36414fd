package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (temporal point-in-time) join — "for each left row, the single
  * right row with the nearest timestamp at-or-before (backward) /
  * at-or-after (forward) the left timestamp, per key".
  *
  * The naive relational encoding — a range join plus a per-left-row
  * argmax — explodes: every left row joins EVERY earlier right row of its
  * key before the max is taken, O(|L|·|R|) per key. This implementation
  * instead unions both sides into one (key, time)-ordered stream and takes
  * a running `last(right_payload, ignoreNulls)` window: exactly ONE
  * shuffle (hash by key), one sort by time — the same cost as a
  * sort-merge join, independent of how many right rows precede each left
  * row. At 100 TB that's the difference between a linear pass and a
  * quadratic blowup on dense keys; window partitions spill, so a whale
  * key degrades to disk, not OOM.
  *
  * Tie semantics match DuckDB's `ASOF JOIN` inequality forms: inclusive
  * (`>=`/`<=`) pairs a right row whose time EQUALS the left time (the
  * union sort places right rows before left rows at the same instant);
  * `strict=true` (`>`/`<`) excludes the equal instant.
  *
  * CONTRACT: the right side must be unique per (keys, rightTime) — with
  * duplicates, which duplicate wins depends on partition sort order (as it
  * does in every engine's as-of, DuckDB included). Pre-aggregate when the
  * source has collisions.
  */
object AsOf {

  /** As-of join `left` with `right` on equal `keys` and the nearest
    * `rightTime` relative to `leftTime`.
    *
    * @param direction "backward" (latest right at-or-before left, the
    *                  default everywhere from pandas `merge_asof` to
    *                  DuckDB) or "forward" (earliest right at-or-after)
    * @param joinType  "inner" (drop unmatched left rows, DuckDB's `ASOF
    *                  JOIN`) or "left" (`ASOF LEFT JOIN`, unmatched rows
    *                  keep NULL right columns)
    * @param strict    exclude right rows at exactly the left time
    * @param tolerance max |left.time − right.time| to accept, as an
    *                  interval Column (e.g. `expr("INTERVAL 1 HOUR")`);
    *                  out-of-tolerance matches become non-matches
    * @param rightPrefix prefix for the right side's non-key output columns
    *                  (which include its time column)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      direction: String = "backward", joinType: String = "inner",
      strict: Boolean = false, tolerance: Option[Column] = None,
      rightPrefix: String = "r_"): DataFrame = {
    require(direction == "backward" || direction == "forward", direction)
    require(joinType == "inner" || joinType == "left", joinType)
    val leftCols = left.columns.toSeq
    val leftOnly = leftCols.filterNot(keys.contains)
    val rightPayload = right.columns.toSeq.filterNot(keys.contains)
    require(rightPayload.contains(rightTime),
      s"right time column $rightTime must not be a join key")

    // Harmonize both sides to one schema: keys ++ left-only columns
    // (NULL on right rows) ++ __t/__src/__r. The right payload rides as
    // ONE struct column so the window needs a single last() — and a NULL
    // struct (not a struct of NULLs) marks "no right row yet".
    val rStruct = struct(rightPayload.map(col): _*)
    val rType = right.select(rStruct.as("s")).schema("s").dataType
    val leftSchema: StructType = left.schema
    val lSide = left.select(
      keys.map(col) ++ leftOnly.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(1).as("__src"),
        lit(null).cast(rType).as("__r")): _*)
    // A NULL time matches nothing in any engine's as-of (NULL compares
    // false): drop NULL-time right rows up front, and gate left rows on
    // __t below — otherwise NULLS FIRST/LAST ordering would hand them a
    // running match.
    val rSide = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) ++ leftOnly.map(c =>
        lit(null).cast(leftSchema(c).dataType).as(c)) ++ Seq(
        col(rightTime).as("__t"), lit(0).as("__src"),
        rStruct.as("__r")): _*)

    // Backward: ascending time, right (src 0) first at equal instants so
    // the running last() sees it. Forward: descending time — "preceding"
    // rows are the LATER ones, and the running last() is then the
    // earliest right row at-or-after. strict flips the equal-instant
    // order so the left row precedes its contemporaries.
    val tOrd = if (direction == "backward") col("__t").asc else col("__t").desc
    val srcOrd = if (strict) col("__src").desc else col("__src").asc
    val win = Window.partitionBy(keys.map(col): _*).orderBy(tOrd, srcOrd)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matchedRaw = last(col("__r"), ignoreNulls = true).over(win)
    // strict still matches an equal-instant right row through OTHER left
    // rows at the same instant having pulled it into the running frame?
    // No: src.desc puts ALL left rows of an instant before its right
    // rows, so no left row at time t can see a right row at time t.
    val withMatch = lSide.unionByName(rSide)
      .withColumn("__m", matchedRaw)
      .filter(col("__src") === 1)

    val rt = col(s"__m.$rightTime")
    val inTol = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (direction == "backward") rt >= col("__t") - tol
        else rt <= col("__t") + tol
    }
    val gated = withMatch.withColumn("__m",
      when(col("__t").isNotNull && col("__m").isNotNull && inTol, col("__m")))

    val out = gated.select(
      leftCols.map(col) ++
        rightPayload.map(c => col(s"__m.$c").as(rightPrefix + c)): _*)
    if (joinType == "inner") out.filter(col(rightPrefix + rightTime).isNotNull)
    else out
  }
}
