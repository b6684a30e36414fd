package graft.probes

import graft.{Probe, Tables}
import graft.operators.Multimodal
import graft.streaming.EventStreams

/** Event-time windowing + multimodal probes, run in batch mode through
  * the SAME transforms the streaming paths use (EventStreams is
  * batch/stream agnostic — SURVEY §7 M6). Oracles rebuild each window
  * semantics from first principles in DuckDB (time_bucket, slide
  * expansion, gaps-and-islands sessionization).
  */
object StreamingWindows {
  val probes: Seq[Probe] = Seq(

    Probe.df("q_window_tumbling",
      """SELECT time_bucket(INTERVAL 15 MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00') AS win_start,
        |  event_type, count(*) AS n, sum(value) AS sum_v
        |FROM events
        |GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin) { (s, dir) =>
      EventStreams.tumblingAgg(Tables.load(s, dir, "events"), "15 minutes")
        .orderBy("win_start", "event_type")
    },

    // width 30m / slide 10m ⇒ every event in exactly 3 windows
    Probe.df("q_window_sliding",
      """SELECT win_start, count(*) AS n, sum(value) AS sum_v FROM (
        |  SELECT time_bucket(INTERVAL 10 MINUTE, ts, TIMESTAMP '1970-01-01 00:00:00')
        |           - k.k * INTERVAL 10 MINUTE AS win_start, value
        |  FROM events, (SELECT unnest([0, 1, 2]) AS k) k
        |) GROUP BY win_start
        |ORDER BY win_start""".stripMargin) { (s, dir) =>
      EventStreams.slidingAgg(Tables.load(s, dir, "events"),
          "30 minutes", "10 minutes")
        .orderBy("win_start")
    },

    // sessions split when the gap to the previous event is >= 2h
    // (Spark merges [ts, ts+gap) intervals on overlap)
    Probe.df("q_window_session",
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 2 HOUR
        |         THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        |), s AS (
        |  SELECT user_id, ts, value,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                   ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id, min(ts) AS win_start, count(*) AS n, sum(value) AS sum_v
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, win_start""".stripMargin) { (s, dir) =>
      EventStreams.sessionAgg(Tables.load(s, dir, "events"), "2 hours")
        .orderBy("user_id", "win_start")
    },

    // multimodal: metadata + byte counts flow through the real
    // partition-parallel decode path (the codec itself is the stub)
    Probe.df("q_multimodal_meta",
      """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        |  count(*) AS n, CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
        |FROM documents
        |GROUP BY kind
        |ORDER BY kind""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Multimodal.extractFeatures(
          Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")))
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).cast("bigint").as("total_bytes"))
        .orderBy("kind")
    },

    // pHash media near-dup: 25 planted exact copies (ids +10000) must
    // pair with their originals at Hamming 0 through the banded path.
    // FULL oracle (VERDICT r9 #8): the stub codec is deterministic —
    // content is the UTF-8 bytes of ASCII `text`, the 64 energy bins
    // accumulate byte/255.0 in byte order, and the mean divide is a
    // same-operand IEEE step — so DuckDB replays signs exactly and
    // brute-forces pair Hamming (oracle scale only). Banding at
    // maxHamming=3 over 4×16-bit bands is recall-COMPLETE by
    // pigeonhole, and no bucket can exceed the whale cap at 525 rows,
    // so the banded Spark plan equals the quadratic truth.
    Probe.df("q_media_neardup",
      """WITH m AS (
        |  SELECT doc_id AS media_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000 AS media_id, text FROM documents
        |  WHERE doc_id < 25
        |), s AS (
        |  SELECT media_id,
        |    list_transform(range(64), k ->
        |      COALESCE(list_sum(list_transform(
        |        list_filter(range(length(text)), i -> i % 64 = k),
        |        i -> ascii(substr(text, CAST(i AS INT) + 1, 1)) / 255.0)),
        |        0.0)) AS bins
        |  FROM m
        |), g AS (
        |  SELECT media_id,
        |    list_transform(bins, x ->
        |      CASE WHEN x > list_sum(bins) / 64 THEN 1 ELSE -1 END) AS sv
        |  FROM s
        |)
        |SELECT ida, idb, hamming FROM (
        |  SELECT a.media_id AS ida, b.media_id AS idb,
        |    CAST(len(list_filter(range(64), j ->
        |      a.sv[CAST(j AS INT) + 1] <> b.sv[CAST(j AS INT) + 1]))
        |      AS INT) AS hamming
        |  FROM g a, g b WHERE a.media_id < b.media_id)
        |WHERE hamming <= 3
        |ORDER BY ida, idb""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Multimodal.mediaFromDocuments(
        Tables.load(s, dir, "documents"))
      val dups = media.filter(org.apache.spark.sql.functions.col("media_id") < 25)
        .map(m => m.copy(media_id = m.media_id + 10000))
      Multimodal.mediaNearDupPairs(media.unionByName(dups), maxHamming = 3)
        .orderBy("ida", "idb")
    },

    Probe.df("q_multimodal_frames",
      """SELECT doc_id AS media_id,
        |  CAST((n_chars * 40 - 1) // 5000 + 1 AS BIGINT) AS n_frames
        |FROM documents
        |WHERE doc_id % 3 = 2
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(Tables.load(s, dir, "documents")),
          everyMs = 5000)
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"))
        .orderBy("media_id")
    }
  )
}
