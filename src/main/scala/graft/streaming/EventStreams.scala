package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — the extension surface
  * reserved in SURVEY §2.11/§7-M6 (the reference is strictly batch; its
  * SymmetricHashJoinExec is unreachable without unbounded sources).
  *
  * Every transform here is written against a plain `DataFrame`, so the
  * SAME code path serves batch (`spark.read`) and Structured Streaming
  * (`spark.readStream` + watermark): Spark's `window`/`session_window`
  * operators are batch/stream agnostic. The streaming wrapper only adds
  * the watermark — which is exactly how a 100 TB backfill + live tail
  * share one implementation.
  */
object EventStreams {

  /** Tumbling event-time windows: count + sum per (window, event_type). */
  def tumblingAgg(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_v"))

  /** Sliding windows (width > slide ⇒ each event lands in width/slide
    * windows). */
  def slidingAgg(events: DataFrame, width: String, slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("win_start"), col("n"), col("sum_v"))

  /** Session windows per user: a session extends while consecutive events
    * are < gap apart (Spark semantics: intervals [ts, ts+gap) merge on
    * overlap). */
  def sessionAgg(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("user_id"), col("w.start").as("win_start"),
        col("n"), col("sum_v"))

  /** Streaming variant of [[tumblingAgg]]: watermarked event-time
    * aggregation, append-mode compatible (finalized windows only). */
  def tumblingAggStream(events: DataFrame, width: String,
      watermark: String): DataFrame =
    tumblingAggInner(events.withWatermark("ts", watermark), width)

  private def tumblingAggInner(events: DataFrame, width: String): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_v"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n"), col("sum_v"))

  /** Stream-stream inner join: correlate two event streams on `key`
    * where the right event lands within `within` after the left one.
    * Watermarks on both sides bound the join state — without them a
    * stream-stream join buffers forever (the 100 TB streaming failure
    * mode). */
  def correlateStreams(left: DataFrame, right: DataFrame, key: String,
      within: String): DataFrame = {
    val l = left.withWatermark("ts", within).alias("l")
    val r = right.withWatermark("ts", within).alias("r")
    l.join(r, expr(
        s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL $within"))
      .select(col(s"l.$key").as(key), col("l.ts").as("l_ts"),
        col("r.ts").as("r_ts"))
  }

  /** Expiring-session tracker: `flatMapGroupsWithState` with an EVENT-TIME
    * TIMEOUT. Per-user state accumulates (n, sum, start, end) while events
    * arrive; when the watermark passes `end + gap` the state times out and
    * the CLOSED session is emitted exactly once (append mode). This is the
    * pattern for state the built-in `session_window` can't express —
    * arbitrary per-session accumulators with a guaranteed single final
    * emission — and the timeout bounds state size on an unbounded stream
    * (the 100 TB streaming requirement: state is O(active users), never
    * O(history)). */
  def expiringSessions(events: DataFrame, gap: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val units = Map(
      "ms" -> 1L, "milli" -> 1L, "millisecond" -> 1L,
      "sec" -> 1000L, "second" -> 1000L,
      "min" -> 60000L, "minute" -> 60000L,
      "hour" -> 3600000L, "day" -> 86400000L)
    val gapMillis = gap.trim.split("\\s+") match {
      case Array(n, u) if n.forall(_.isDigit) =>
        val raw = u.toLowerCase
        units.get(raw).orElse(units.get(raw.stripSuffix("s")))
          .map(n.toLong * _)
          .getOrElse(throw new IllegalArgumentException(s"bad gap unit: '$gap'"))
      case _ => throw new IllegalArgumentException(s"bad gap: '$gap'")
    }
    events
      .withWatermark("ts", gap)
      .select(col("user_id").cast("long"), col("ts"), col("value").cast("double"))
      .as[(Long, java.sql.Timestamp, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)],
         state: GroupState[(Long, Double, Long, Long)]) =>
          if (state.hasTimedOut) {
            val (n, s, start, end) = state.get
            state.remove()
            Iterator((uid, new java.sql.Timestamp(start),
              new java.sql.Timestamp(end), n, s))
          } else {
            var (n, s, start, end) = state.getOption.getOrElse(
              (0L, 0.0, Long.MaxValue, Long.MinValue))
            rows.foreach { case (_, t, v) =>
              n += 1; s += v
              start = math.min(start, t.getTime); end = math.max(end, t.getTime)
            }
            state.update((n, s, start, end))
            state.setTimeoutTimestamp(end + gapMillis)
            Iterator.empty
          }
      }
      .toDF("user_id", "session_start", "session_end", "n", "sum_v")
  }

  /** Custom-state streaming: running per-user (count, sum) maintained in
    * `GroupState` across micro-batches — the `mapGroupsWithState` pattern
    * for state the built-in windowed aggregations can't express. Emits the
    * updated totals for every user seen in the batch (use with
    * OutputMode.Update). */
  def statefulUserTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Double)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          (uid, n, s)
      }
      .toDF("user_id", "n", "sum_v")
  }

  /** Streaming exact dedup: emit each text's FIRST arrival, drop
    * duplicates that land within the watermark horizon — the on-arrival
    * counterpart of [[graft.operators.Dedup.exactDedup]], keyed on the
    * same md5(lower(text)) fingerprint so a batch backfill and the live
    * tail dedupe identically. `dropDuplicatesWithinWatermark` (not plain
    * `dropDuplicates`) is the only scale-safe form: state holds one
    * 16-byte fingerprint per document seen within the horizon and the
    * watermark EXPIRES it, where the unwatermarked variant's state is
    * O(all history) — the unbounded-state streaming failure mode. */
  def dedupDocStream(docs: DataFrame, tsCol: String, textCol: String,
      watermark: String): DataFrame =
    docs.withColumn("__fp", md5(lower(col(textCol))))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Streaming interval-overlap join — the live-tail counterpart of
    * [[graft.operators.IntervalJoin.overlapPairs]], same bucket math
    * ([[graft.operators.IntervalJoin.fdiv]]) so backfill and tail
    * correlate identically.
    *
    * Both sides expose (id, sTs, eTs) with TIMESTAMP bounds; intervals
    * must be shorter than `maxSpan`. The join key is the time bucket,
    * the overlap predicate re-checks exactly, and the canonical-bucket
    * rule (`__bk == bucket(later start)`) dedups cross-bucket hits with
    * NO post-join aggregation — which is what makes this runnable in
    * append mode as a single stateful operator. State is bounded two
    * ways: watermarks on both start timestamps, and the `maxSpan` range
    * condition between them, from which Spark derives state eviction —
    * without it a stream-stream join buffers forever (the 100 TB
    * streaming failure mode). (StreamingJoinHelper probes EVERY
    * inequality in the condition and WARN-logs the long-typed overlap
    * predicates it can't turn into state bounds — noise; the timestamp
    * range pair is the canonical extractable shape it does use.) */
  def overlapPairsStream(
      a: DataFrame, idA: String, sA: String, eA: String,
      b: DataFrame, idB: String, sB: String, eB: String,
      bin: Long, watermark: String, maxSpan: String): DataFrame = {
    import graft.operators.IntervalJoin.fdiv
    require(bin > 0, "bin width must be positive")
    // same shape as IntervalJoin.binned, plus the watermarked TIMESTAMP
    // columns kept alongside the micro bounds (the join's state-eviction
    // range condition needs event-time-typed operands)
    def prep(df: DataFrame, id: String, s: String, e: String,
        oid: String, os: String, oe: String, obk: String): DataFrame =
      df.withWatermark(s, watermark)
        .select(col(id).as(oid),
          col(s).as(s"${os}_ts"), col(e).as(s"${oe}_ts"),
          unix_micros(col(s)).as(os), unix_micros(col(e)).as(oe))
        .where(col(os) <= col(oe))
        .withColumn(obk, explode(sequence(fdiv(os, bin), fdiv(oe, bin))))
    val ax = prep(a, idA, sA, eA, "ida", "sa", "ea", "__bka")
    val bx = prep(b, idB, sB, eB, "idb", "sb", "eb", "__bkb")
    ax.join(bx,
        col("__bka") === col("__bkb") &&
        col("sa") <= col("eb") && col("sb") <= col("ea") &&
        col("__bka") === greatest(fdiv("sa", bin), fdiv("sb", bin)) &&
        // event-time range between the WATERMARKED columns: the state
        // eviction bound (each side buffers only maxSpan of the other)
        col("sb_ts") >= col("sa_ts") - expr(s"INTERVAL $maxSpan") &&
        col("sb_ts") <= col("sa_ts") + expr(s"INTERVAL $maxSpan"))
      .select(col("ida"), col("idb"), col("sa"), col("ea"),
        col("sb"), col("eb"))
  }
}
