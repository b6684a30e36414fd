package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each user's event stream into sessions
  * separated by inactivity gaps — the batch complement of the streaming
  * `session_window` aggregation (q_window_session).
  *
  * Shape: ONE shuffle (hash by user), one sort by (ts, tieBreak); the
  * lag-flag and the running sum reuse the same window sort, and the
  * per-session rollup in [[sessions]] rides the same partitioning (the
  * group-by key is prefixed by the user column), so AQE plans no second
  * exchange of the events. Gap arithmetic runs on `unix_micros` — exact
  * integers, so the session boundaries are bit-identical in any engine
  * (float epoch seconds are not; FIXTURES.md recipes).
  *
  * Determinism: `tieBreak` must make (user, ts, tieBreak...) unique —
  * same-instant events otherwise order arbitrarily and the session
  * SEQUENCE may differ between runs/engines.
  */
object Sessionize {

  /** Events + `session_seq` (1-based per user) + `is_session_start`. */
  def assign(df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String]): DataFrame = {
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(userCol)).orderBy(ord: _*)
    val gapUs = gapSeconds * 1000000L
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isStart = prev.isNull ||
      unix_micros(col(tsCol)) - prev > gapUs
    df.withColumn("is_session_start", isStart)
      .withColumn("session_seq",
        sum(when(isStart, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: start/end, event count, duration in µs. */
  def sessions(df: DataFrame, userCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String]): DataFrame =
    assign(df, userCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol))))
          .as("duration_us"))
}
