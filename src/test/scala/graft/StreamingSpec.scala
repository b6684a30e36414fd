package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Structured-Streaming behavior of the shared window transforms:
  * watermarked tumbling aggregation over a file stream must finalize
  * exactly the windows the batch path computes on the same data. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling agg (append + watermark) matches batch") {
    val dir = Files.createTempDirectory("graft_stream").toFile
    val out = s"graft_stream_out_${System.nanoTime()}"

    val batch1 = Seq(
      (ts("2024-01-01 00:05:00"), "click", 1.0),
      (ts("2024-01-01 00:07:00"), "click", 2.0),
      (ts("2024-01-01 00:12:00"), "view", 3.0),
      (ts("2024-01-01 00:25:00"), "view", 4.0)
    ).toDF("ts", "event_type", "value")
    batch1.coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val query = EventStreams
      .tumblingAggStream(stream, "10 minutes", "0 seconds")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    query.processAllAvailable()

    // second batch advances the watermark past the first batch's windows
    Seq((ts("2024-01-01 02:00:00"), "click", 9.0))
      .toDF("ts", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    query.processAllAvailable()
    query.stop()

    val streamed = spark.table(out)
      .select("win_start", "event_type", "n", "sum_v")
      .collect().map(_.toSeq).toSet
    val expected = EventStreams.tumblingAgg(batch1, "10 minutes")
      .collect().map(_.toSeq).toSet
    assert(streamed == expected)
  }

  test("curation projections run under Structured Streaming and match " +
      "batch (strip -> NFC -> C4 line rules -> quality signals)") {
    // The stateless curation layer (HTML strip, Unicode normalize, C4
    // line rules, entropy, readability inputs) must be usable on a
    // STREAMING ingest without change — they are pure projections, so
    // the same Column expressions plan in append mode with no state.
    import graft.operators.{C4Rules, Normalize, TextAnalysis}
    val dir = Files.createTempDirectory("graft_stream_cur").toFile
    val out = s"graft_cur_out_${System.nanoTime()}"
    val docs = Seq(
      (1L, "<p>A kept sentence one.</p>\n<script>var x = 1;</script>" +
        "short\nAnother kept sentence!"),
      (2L, "<div>e\u0301cole composed here.</div>\nno terminal punct line"),
      (3L, "<!-- c -->Enable javascript to view this site.\nReal text stays.")
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$dir/b1")

    def curate(df: org.apache.spark.sql.DataFrame) = {
      val stripped = df.select(col("doc_id"),
        Normalize.unicode(Normalize.stripHtml(col("text"))).as("text"))
      C4Rules.clean(stripped, "doc_id", "text")
        .withColumn("char_entropy",
          TextAnalysis.charProfile(col("clean_text"))
            .getField("char_entropy"))
    }

    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/*")
    val q = curate(stream)
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(out).collect().map(_.toSeq).toSet
    val batch = curate(docs).collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // and the NFC actually happened on the streaming path
    val clean2 = spark.table(out).where(col("doc_id") === 2L)
      .select("clean_text").collect().head.getString(0)
    assert(clean2.contains("\u00e9cole"), s"expected composed text: $clean2")
  }

  test("quality-classifier kernel scoring runs unchanged on a " +
      "streaming ingest (zero-state projection)") {
    import graft.operators.QualityClassifier
    val dir = Files.createTempDirectory("graft_stream_qc").toFile
    val out = s"graft_qc_out_${System.nanoTime()}"
    val train = Seq((1L, "spam spam", 1), (2L, "ham prose", 0))
      .toDF("doc_id", "text", "y")
    val model = QualityClassifier.train(train, "doc_id", "text", "y")
    val docs = Seq((10L, "spam here"), (11L, "clean prose"),
      (12L, "spam spam spam")).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/*")
    val q = QualityClassifier.scoreProjected(stream, "doc_id", "text", model)
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val batch = QualityClassifier.scoreProjected(docs, "doc_id", "text", model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamed == batch)
    assert(streamed.exists { case (id, m, p) => id == 12L && m > 0 && p })
  }

  test("bloom decontamination flag runs unchanged on a streaming ingest " +
      "(bench grams as one literal sketch, zero state)") {
    import graft.operators.Contamination
    val dir = Files.createTempDirectory("graft_stream_cont").toFile
    val out = s"graft_cont_out_${System.nanoTime()}"
    val bench = Seq((100L, "the secret eval answer is forty two exactly"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (1L, "contains the secret eval answer is forty two exactly verbatim"),
      (2L, "a completely unrelated clean training document body"),
      (3L, "another clean document with different words entirely")
    ).toDF("doc_id", "text")
    docs.coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/*")
    val q = Contamination.streamFlag(stream, bench, "doc_id", "text", n = 8)
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val flags = spark.table(out).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> false))
    // identical to the batch run of the same flag (determinism), and
    // one-sided vs the exact tier: every overlap() hit must be flagged
    val batch = Contamination.streamFlag(docs, bench, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(batch == flags)
    val exact = Contamination.overlap(docs, bench, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).toSet
    assert(exact.forall(flags(_)))
  }

  test("minhashNovelty drives a continual-pretraining ingest via " +
      "foreachBatch: each micro-batch is screened against the static base") {
    import graft.operators.Dedup
    val dir = Files.createTempDirectory("graft_novelty_stream").toFile
    val base = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again"),
      (101L, "a curated reference document about query engines and joins")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a genuinely novel document with fresh content")
    ).toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(s"$dir/b1")
    val got = scala.collection.mutable.Map.empty[Long, Boolean]
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // the ingest gate: screen ONLY this micro-batch against the
        // base (base bucketed per call here; a long-lived job would
        // hold the base's banded blocks persisted across batches)
        Dedup.minhashNovelty(base, df, "doc_id", "text").collect()
          .foreach(r => got.synchronized {
            got(r.getAs[Long]("doc_id")) = r.getAs[Boolean]("novel")
          })
        ()
      }
      .start()
    q.processAllAvailable()
    // second micro-batch: one near-dup of the OTHER base doc, one novel
    Seq((3L, "a curated reference document about query engines and joins"),
        (4L, "more fresh content that matches nothing in the base"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()
    assert(got.toMap == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true),
      s"got $got")
  }

  test("ivf cell-assign drives a streaming vector ingest via foreachBatch: " +
      "the accumulated index delta equals the batch assignment") {
    import graft.operators.Similarity
    val dir = Files.createTempDirectory("graft_ann_stream").toFile
    def vec(xs: Double*) = xs.map(_.toFloat)
    val base = Seq(
      (1L, vec(1.0, 0.0, 0.0)), (2L, vec(0.0, 1.0, 0.0)),
      (3L, vec(0.0, 0.0, 1.0))).toDF("vec_id", "embedding")
    // centroids frozen from the base corpus — the index-maintenance
    // contract: assignment is a pure per-row function, so streaming
    // micro-batches and a batch rebuild agree exactly
    val cents = Similarity.ivfCentroidsFrom(base, "vec_id", "embedding", 3)
    val b1 = Seq((10L, vec(0.9, 0.1, 0.0)), (11L, vec(0.0, 0.2, 0.9)))
      .toDF("vec_id", "embedding")
    b1.coalesce(1).write.parquet(s"$dir/b1")
    val got = scala.collection.mutable.Map.empty[Long, Int]
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        // the ingest gate: assign ONLY this micro-batch and append the
        // postings — Similarity.ivfIndexDelta is the catalog-batch
        // rendering of the same shape (q_ann_index_delta)
        Similarity.ivfAssign(df, "vec_id", "embedding", cents).collect()
          .foreach(r => got.synchronized {
            got(r.getAs[Long]("vec_id")) = r.getAs[Int]("cell")
          })
        ()
      }
      .start()
    q.processAllAvailable()
    Seq((12L, vec(0.8, 0.0, 0.1)), (13L, vec(0.1, 0.9, 0.0)))
      .toDF("vec_id", "embedding")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()
    val all = Seq(
      (10L, vec(0.9, 0.1, 0.0)), (11L, vec(0.0, 0.2, 0.9)),
      (12L, vec(0.8, 0.0, 0.1)), (13L, vec(0.1, 0.9, 0.0)))
      .toDF("vec_id", "embedding")
    val batch = Similarity.ivfAssign(all, "vec_id", "embedding", cents)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell"))
      .toMap
    assert(got.toMap == batch, s"stream $got vs batch $batch")
    assert(got.toMap == Map(10L -> 0, 11L -> 2, 12L -> 0, 13L -> 1))
  }

  test("streaming CC delta via foreachBatch: per-micro-batch label merge " +
      "into a catalog table equals batch CC over all pairs (VERDICT r12 " +
      "stretch #9)") {
    import graft.operators.Dedup
    // the third member of the novelty/IVF continual-ingest family:
    // near-dup PAIRS arrive in micro-batches; the accumulated (id,
    // cluster) assignment lives in a MetaCatalog table and each batch
    // merges via clusterPairsDelta — O(labels + batch), never re-reading
    // old pairs
    val wh = Files.createTempDirectory("graft_wh_ccd").toString
    spark.conf.set("spark.sql.catalog.gccd", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gccd.warehouse", wh)
    spark.sql("CREATE NAMESPACE gccd.s")
    spark.sql("CREATE TABLE gccd.s.labels (id BIGINT, cluster BIGINT)")
    val dir = Files.createTempDirectory("graft_ccd_stream").toFile
    val b1 = Seq((1L, 2L), (2L, 3L), (7L, 7L)).toDF("ida", "idb")
    b1.coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val labels = spark.table("gccd.s.labels")
        Dedup.clusterPairsDelta(labels, df)
          .createOrReplaceTempView("__ccd_merged")
        spark.sql(
          "INSERT OVERWRITE gccd.s.labels SELECT id, cluster FROM __ccd_merged")
        ()
      }
      .start()
    q.processAllAvailable()
    // batch 2 BRIDGES the {1,2,3} component with a new id and opens a
    // disjoint one — the merged root must re-root at the combined min
    Seq((3L, 4L), (10L, 11L)).toDF("ida", "idb")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gccd.s.labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val allPairs = Seq((1L, 2L), (2L, 3L), (7L, 7L), (3L, 4L), (10L, 11L))
      .toDF("ida", "idb")
    val batch = Dedup.clusterPairsStar(allPairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch, s"stream $streamed vs batch $batch")
    assert(streamed == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 10L -> 10L, 11L -> 10L))
  }

  test("streaming dedup drops cross-batch duplicates, state bounded by watermark") {
    val dir = Files.createTempDirectory("graft_sdedup").toFile
    val out = s"graft_sdedup_out_${System.nanoTime()}"
    val b1 = Seq(
      (ts("2024-01-01 00:00:01"), 1L, "the quick brown fox"),
      (ts("2024-01-01 00:00:02"), 2L, "an original document")
    ).toDF("ts", "doc_id", "text")
    b1.coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = EventStreams.dedupDocStream(stream, "ts", "text", "10 minutes")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()

    // batch 2 re-sends doc 1's text (different id, different case) plus a
    // fresh doc — the duplicate must be dropped, the fresh one kept
    Seq((ts("2024-01-01 00:01:00"), 3L, "THE QUICK BROWN FOX"),
        (ts("2024-01-01 00:01:01"), 4L, "another original"))
      .toDF("ts", "doc_id", "text")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()

    val got = spark.table(out).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L), s"expected first arrivals only, got $got")
  }

  test("mapGroupsWithState keeps running totals across micro-batches") {
    val dir = Files.createTempDirectory("graft_state").toFile
    val out = s"graft_state_out_${System.nanoTime()}"

    val schema = Seq((1L, 1.0)).toDF("user_id", "value").schema
    Seq((1L, 1.0), (1L, 2.0), (2L, 5.0)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val query = graft.streaming.EventStreams.statefulUserTotals(stream)
      .writeStream.format("memory").queryName(out)
      .outputMode("update").start()
    query.processAllAvailable()

    Seq((1L, 4.0)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    query.processAllAvailable()
    query.stop()

    // last update per user must reflect totals across both batches
    val latest = spark.table(out).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).maxBy(_._1) }
    assert(latest(1L) == ((3L, 7.0)))
    assert(latest(2L) == ((1L, 5.0)))
  }

  test("stream-stream join correlates within the watermark window") {
    val dir = Files.createTempDirectory("graft_ss").toFile
    val out = s"graft_ss_out_${System.nanoTime()}"

    val clicks = Seq((1L, ts("2024-01-01 00:00:00")),
      (2L, ts("2024-01-01 00:30:00"))).toDF("user_id", "ts")
    val views = Seq(
      (1L, ts("2024-01-01 00:03:00")),   // within 10m of click 1 → joins
      (1L, ts("2024-01-01 00:20:00")),   // too late → no join
      (2L, ts("2024-01-01 00:31:00"))    // joins click 2
    ).toDF("user_id", "ts")
    clicks.coalesce(1).write.parquet(s"$dir/clicks/b1")
    views.coalesce(1).write.parquet(s"$dir/views/b1")

    val cs = spark.readStream.schema(clicks.schema).parquet(s"$dir/clicks/*")
    val vs = spark.readStream.schema(views.schema).parquet(s"$dir/views/*")
    val q = graft.streaming.EventStreams
      .correlateStreams(cs, vs, "user_id", "10 minutes")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()

    // advance both watermarks far enough to emit the joined rows
    Seq((9L, ts("2024-01-01 03:00:00"))).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(s"$dir/clicks/b2")
    Seq((9L, ts("2024-01-01 03:00:00"))).toDF("user_id", "ts")
      .coalesce(1).write.mode("append").parquet(s"$dir/views/b2")
    q.processAllAvailable()
    q.stop()

    val rows = spark.table(out)
      .collect().map(r => (r.getLong(0), r.getTimestamp(2).toString)).toSet
    assert(rows.contains((1L, "2024-01-01 00:03:00.0")))
    assert(rows.contains((2L, "2024-01-01 00:31:00.0")))
    assert(!rows.exists(_._2 == "2024-01-01 00:20:00.0"))
  }

  test("streaming interval-overlap join matches the batch operator") {
    val dir = Files.createTempDirectory("graft_sij").toFile
    val out = s"graft_sij_out_${System.nanoTime()}"
    val binUs = 600000000L // 10-minute buckets (micros)

    val aRows = Seq(
      (10L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:15:00")),
      (11L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:05:00")))
    val bRows = Seq(
      (20L, ts("2024-01-01 00:10:00"), ts("2024-01-01 00:20:00")), // ∩ a10
      (21L, ts("2024-01-01 00:16:00"), ts("2024-01-01 00:30:00")), // ∩ none
      (22L, ts("2024-01-01 01:04:00"), ts("2024-01-01 01:06:00"))) // ∩ a11
    val aDf = aRows.toDF("id", "s_ts", "e_ts")
    val bDf = bRows.toDF("id", "s_ts", "e_ts")
    aDf.coalesce(1).write.parquet(s"$dir/a/b1")
    bDf.coalesce(1).write.parquet(s"$dir/b/b1")

    val as = spark.readStream.schema(aDf.schema).parquet(s"$dir/a/*")
    val bs = spark.readStream.schema(bDf.schema).parquet(s"$dir/b/*")
    val q = EventStreams.overlapPairsStream(
        as, "id", "s_ts", "e_ts", bs, "id", "s_ts", "e_ts",
        binUs, "0 seconds", "1 hour")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    // advance both watermarks so every buffered match is flushed
    Seq((98L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:01")))
      .toDF("id", "s_ts", "e_ts").coalesce(1)
      .write.mode("append").parquet(s"$dir/a/b2")
    Seq((99L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:01")))
      .toDF("id", "s_ts", "e_ts").coalesce(1)
      .write.mode("append").parquet(s"$dir/b/b2")
    q.processAllAvailable()
    // one more empty-advance batch so the join state watermark derived
    // from the sentinels' event time actually evicts the old intervals
    Seq((97L, ts("2024-01-01 09:00:00"), ts("2024-01-01 09:00:01")))
      .toDF("id", "s_ts", "e_ts").coalesce(1)
      .write.mode("append").parquet(s"$dir/a/b3")
    q.processAllAvailable()
    // state EVICTION evidence, not just bounded-by-construction: the
    // watermark + maxSpan range condition must have removed buffered
    // rows from the stream-stream join state
    val removed = q.recentProgress
      .flatMap(_.stateOperators).map(_.numRowsRemoved).sum
    assert(removed > 0, "watermark evicted no join state rows")
    q.stop()

    val streamed = spark.table(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // the batch operator over the same (micros-typed) intervals,
    // including the watermark-advance sentinels, is the truth
    def us(rows: Seq[(Long, Timestamp, Timestamp)], extra: (Long, Timestamp, Timestamp)) =
      (rows :+ extra).toDF("id", "s_ts", "e_ts")
        .select(col("id"), unix_micros(col("s_ts")).as("s"),
          unix_micros(col("e_ts")).as("e"))
    val expected = graft.operators.IntervalJoin.overlapPairs(
        us(aRows, (98L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:01"))),
        "id", "s", "e",
        us(bRows, (99L, ts("2024-01-01 06:00:00"), ts("2024-01-01 06:00:01"))),
        "id", "s", "e", binUs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(streamed == expected, s"streamed=$streamed expected=$expected")
    assert(streamed.map(p => (p._1, p._2)) == Set((10L, 20L), (11L, 22L),
      (98L, 99L)))
  }

  test("foreachBatch streams micro-batches into a MetaCatalog table") {
    val wh = Files.createTempDirectory("graft_wh_stream").toString
    spark.conf.set("spark.sql.catalog.graftsink", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.graftsink.warehouse", wh)
    spark.sql("CREATE NAMESPACE graftsink.s")
    spark.sql("CREATE TABLE graftsink.s.events (user_id BIGINT, value DOUBLE)")

    val dir = Files.createTempDirectory("graft_fb").toFile
    Seq((1L, 1.5), (2L, 2.5)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream
      .schema(Seq((1L, 1.0)).toDF("user_id", "value").schema)
      .parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.writeTo("graftsink.s.events").append()
      }
      .start()
    q.processAllAvailable()
    Seq((3L, 3.5)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()

    assert(spark.sql("SELECT count(*) FROM graftsink.s.events")
      .collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT sum(value) FROM graftsink.s.events")
      .collect().head.getDouble(0) == 7.5)
  }

  test("idempotentAppend: a batch re-delivered after a mid-batch crash " +
      "does not double-ingest (VERDICT r13 #7)") {
    val wh = Files.createTempDirectory("graft_wh_idem").toString
    spark.conf.set("spark.sql.catalog.gidem", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gidem.warehouse", wh)
    spark.sql("CREATE NAMESPACE gidem.s")
    spark.sql("CREATE TABLE gidem.s.sink " +
      "(user_id BIGINT, value DOUBLE, _batch_id BIGINT)")

    val dir = Files.createTempDirectory("graft_idem_src").toFile
    val ckpt = Files.createTempDirectory("graft_idem_ck").toString
    Seq((1L, 1.5), (2L, 2.5)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")

    // the crash injection fires AFTER the sink write, BEFORE Spark logs
    // the batch as committed — the exact window where at-least-once
    // foreachBatch re-delivers and a naive append double-ingests
    @volatile var crashed = false
    def startStream() = spark.readStream
      .schema(Seq((1L, 1.0)).toDF("user_id", "value").schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.catalog.CatalogStreams.idempotentAppend("gidem.s.sink")(df, id)
        if (id == 1L && !crashed) {
          crashed = true
          throw new RuntimeException("injected mid-batch crash")
        }
      }
      .start()

    val q1 = startStream()
    q1.processAllAvailable() // batch 0 lands cleanly
    Seq((3L, 3.5)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination(30000)
    }
    // the half-state the recipe exists for: batch 1's row IS in the sink
    // but the checkpoint never committed it
    assert(spark.sql(
        "SELECT count(*) FROM gidem.s.sink WHERE _batch_id = 1")
      .collect().head.getLong(0) == 1L, "crash must land after the write")

    // restart from the same checkpoint: batch 1 is RE-DELIVERED with the
    // same id; delete-then-append converges to exactly one copy
    val q2 = startStream()
    q2.processAllAvailable()
    q2.stop()
    val rows = spark.sql(
        "SELECT user_id, value, _batch_id FROM gidem.s.sink")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .toSeq.sorted
    assert(rows == Seq((1L, 1.5, 0L), (2L, 2.5, 0L), (3L, 3.5, 1L)),
      s"re-delivery must not duplicate or lose rows: $rows")
  }

  test("readChangelog tails ACROSS merge-on-read deletes: position and " +
      "equality deletes arrive as row-exact delete events, exactly once") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_wh_cltail").toString
    spark.conf.set("spark.sql.catalog.gcl", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gcl.warehouse", wh)
    spark.sql("CREATE NAMESPACE gcl.s")
    spark.sql("""CREATE TABLE gcl.s.feed (id BIGINT, v DOUBLE)
      TBLPROPERTIES ('write.delete.mode'='merge-on-read')""")          // v1
    spark.sql("INSERT INTO gcl.s.feed VALUES (1, 1.5), (2, 2.5), (3, 3.5)") // v2

    val out = s"graft_cl_out_${System.nanoTime()}"
    val q = graft.catalog.CatalogStreams.readChangelog(spark, "gcl.s.feed")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    def events(): Seq[(Long, String, Long)] = spark.table(out)
      .select("id", "_change_type", "_commit_version").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sorted
    assert(events() == Seq((1L, "insert", 2L), (2L, "insert", 2L),
      (3L, "insert", 2L)))

    // a MOR position DELETE mid-stream: the append-only tail would fail
    // here; the changelog tail delivers the row as a delete event
    spark.sql("DELETE FROM gcl.s.feed WHERE id = 2")                   // v3
    q.processAllAvailable()
    assert(events().contains((2L, "delete", 3L)))

    // an equality delete mid-stream: same contract
    graft.catalog.Maintenance.deleteByKey(spark, "gcl.s.feed",
      Seq(3L).toDF("id"))                                              // v4
    // and a fresh insert in the next commit
    spark.sql("INSERT INTO gcl.s.feed VALUES (4, 4.5)")                // v5
    q.processAllAvailable()
    q.stop()
    assert(events() == Seq(
      (1L, "insert", 2L), (2L, "insert", 2L), (3L, "insert", 2L),
      (2L, "delete", 3L), (3L, "delete", 4L),
      (4L, "insert", 5L)).sorted, s"got ${events()}")

    // the current table state matches replaying the event stream
    assert(spark.sql("SELECT id FROM gcl.s.feed ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 4L))
  }

  test("a changelog stream whose offset snapshot was EXPIRED fails " +
      "loudly instead of re-attributing its adds (r16 review)") {
    val wh = Files.createTempDirectory("graft_wh_clexp").toString
    spark.conf.set("spark.sql.catalog.gclx", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gclx.warehouse", wh)
    spark.sql("CREATE NAMESPACE gclx.s")
    spark.sql("CREATE TABLE gclx.s.feed (id BIGINT)")                  // v1
    spark.sql("INSERT INTO gclx.s.feed VALUES (1)")                    // v2
    val ckpt = Files.createTempDirectory("graft_clexp_ckpt").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = graft.catalog.CatalogStreams
      .readChangelog(spark, "gclx.s.feed")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.select("id").collect().foreach(r => seen.add(r.getLong(0)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val q = start()
    q.processAllAvailable() // committed offset = v2
    q.stop()
    spark.sql("INSERT INTO gclx.s.feed VALUES (2)")                    // v3
    spark.sql("INSERT INTO gclx.s.feed VALUES (3)")                    // v4
    // expire v1..v3: the stream's diff baseline (v2) is gone
    graft.catalog.Maintenance.expireSnapshots(spark, "gclx.s.feed",
      keepLast = 1)
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    q2.stop()
    assert(e.getMessage.contains("expired") ||
      Option(e.getCause).exists(_.getMessage.contains("expired")),
      e.getMessage.take(400))
  }

  test("streaming WAP: micro-batches stage on a branch, publish atomically") {
    // the production shape: a stream lands on an AUDIT branch; consumers
    // of main see NOTHING until a (human or rule) gate fast-forwards —
    // then the whole staged history becomes visible in one commit
    val wh = Files.createTempDirectory("graft_wh_swap").toString
    spark.conf.set("spark.sql.catalog.gswap", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gswap.warehouse", wh)
    spark.sql("CREATE NAMESPACE gswap.s")
    spark.sql("CREATE TABLE gswap.s.ev (user_id BIGINT, value DOUBLE)") // v1
    spark.sql("INSERT INTO gswap.s.ev VALUES (0, 0.5)")                 // v2
    spark.sql("CALL gswap.system.create_branch('s.ev', 'ingest', 2)").collect()

    val dir = Files.createTempDirectory("graft_fb_wap").toFile
    Seq((1L, 1.5), (2L, 2.5)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    val stream = spark.readStream
      .schema(Seq((1L, 1.0)).toDF("user_id", "value").schema)
      .parquet(s"$dir/*")
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        df.writeTo("gswap.s.ev.branch_ingest").append()
      }
      .start()
    q.processAllAvailable()
    Seq((3L, 3.5)).toDF("user_id", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()

    // staged rows are invisible on main, visible on the branch
    assert(spark.sql("SELECT count(*) FROM gswap.s.ev")
      .collect().head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) FROM gswap.s.ev.branch_ingest")
      .collect().head.getLong(0) == 4)
    spark.sql("CALL gswap.system.fast_forward('s.ev', 'ingest')").collect()
    assert(spark.sql("SELECT sum(value) FROM gswap.s.ev")
      .collect().head.getDouble(0) == 8.0)
  }

  test("flatMapGroupsWithState event-time timeout closes sessions exactly once") {
    val dir = Files.createTempDirectory("graft_fmg").toFile
    val out = s"graft_fmg_out_${System.nanoTime()}"

    // user 1: two events 2m apart (one session); user 2: one event
    Seq((1L, ts("2024-01-01 00:00:00"), 1.0),
        (1L, ts("2024-01-01 00:02:00"), 2.0),
        (2L, ts("2024-01-01 00:01:00"), 5.0))
      .toDF("user_id", "ts", "value")
      .coalesce(1).write.parquet(s"$dir/b1")

    val schema = Seq((1L, ts("2024-01-01 00:00:00"), 1.0))
      .toDF("user_id", "ts", "value").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = EventStreams.expiringSessions(stream, "5 minutes")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    // nothing closed yet: watermark hasn't passed any session's end + gap
    assert(spark.table(out).count() == 0)

    // far-future event advances the watermark; both sessions time out
    Seq((9L, ts("2024-01-01 06:00:00"), 0.0)).toDF("user_id", "ts", "value")
      .coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()

    val sessions = spark.table(out).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3), r.getDouble(4))).toSet
    assert(sessions.contains(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:02:00.0", 2L, 3.0)))
    assert(sessions.contains(
      (2L, "2024-01-01 00:01:00.0", "2024-01-01 00:01:00.0", 1L, 5.0)))
    // user 9's session is still open (emitted 0 or stays buffered) — only
    // CLOSED sessions appear, each exactly once
    assert(spark.table(out).count() == 2)
  }

  test("streaming read tails an append-only MetaCatalog table") {
    val wh = Files.createTempDirectory("graft_wh_tail").toString
    spark.conf.set("spark.sql.catalog.gtail", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail.s")
    spark.sql("CREATE TABLE gtail.s.feed (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gtail.s.feed VALUES (1, 1.5), (2, 2.5)")

    val out = s"graft_tail_out_${System.nanoTime()}"
    val q = graft.catalog.CatalogStreams.readTable(spark, "gtail.s.feed")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table(out).count() == 2)

    spark.sql("INSERT INTO gtail.s.feed VALUES (3, 3.5)") // next micro-batch
    q.processAllAvailable()
    q.stop()
    assert(spark.table(out).collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))

    // overwrite breaks append-only history → subsequent readTable refuses
    spark.sql("INSERT OVERWRITE gtail.s.feed VALUES (9, 9.9)")
    val e = intercept[IllegalArgumentException] {
      graft.catalog.CatalogStreams.readTable(spark, "gtail.s.feed")
    }
    assert(e.getMessage.contains("non-append history"))
  }

  test("catalog tail delivers only committed files; mid-stream rewrite fails the stream") {
    val wh = Files.createTempDirectory("graft_wh_tail2").toString
    spark.conf.set("spark.sql.catalog.gtail2", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail2.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail2.s")
    spark.sql("CREATE TABLE gtail2.s.feed (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gtail2.s.feed VALUES (1, 1.5)")

    // crash-window simulation: a data file that was moved into data/ but
    // whose snapshot never committed must NOT be streamed
    val dir = java.nio.file.Paths.get(wh, "s", "feed")
    Seq((99L, 99.9)).toDF("id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$wh/_stray")
    val stray = new java.io.File(s"$wh/_stray").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    Files.copy(stray, dir.resolve("data").resolve("uncommitted-stray.parquet"))

    val out = s"graft_tail2_out_${System.nanoTime()}"
    val q = graft.catalog.CatalogStreams.readTable(spark, "gtail2.s.feed")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table(out).collect().map(_.getLong(0)).toSet == Set(1L),
      "stray uncommitted file must not be delivered")

    // a rewriting commit (COW DELETE) mid-stream fails the NEXT batch
    // loudly instead of re-delivering the rewritten survivor file
    spark.sql("INSERT INTO gtail2.s.feed VALUES (2, 2.5), (3, 3.5)")
    q.processAllAvailable()
    assert(spark.table(out).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
    spark.sql("DELETE FROM gtail2.s.feed WHERE id = 2")
    spark.sql("INSERT INTO gtail2.s.feed VALUES (4, 4.5)")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    assert(err.getMessage.contains("non-append"), err.getMessage.take(300))
    // and nothing was duplicated into the sink
    assert(spark.table(out).collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
  }

  test("maxSnapshotsPerTrigger catches a lagging tail up in bounded " +
      "micro-batches with batch parity (VERDICT r12 #4)") {
    val wh = Files.createTempDirectory("graft_wh_tail5").toString
    spark.conf.set("spark.sql.catalog.gtail5", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail5.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail5.s")
    spark.sql("CREATE TABLE gtail5.s.feed (id BIGINT, v DOUBLE)")
    // three committed snapshots BEFORE the stream starts: an uncapped
    // source would deliver them as ONE catch-up batch
    spark.sql("INSERT INTO gtail5.s.feed VALUES (1, 1.0)")
    spark.sql("INSERT INTO gtail5.s.feed VALUES (2, 2.0)")
    spark.sql("INSERT INTO gtail5.s.feed VALUES (3, 3.0)")

    val out = s"graft_tail5_out_${System.nanoTime()}"
    val q = graft.catalog.CatalogStreams.readTable(spark, "gtail5.s.feed",
        Map("maxSnapshotsPerTrigger" -> "1"))
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches == 3,
      s"expected 3 capped micro-batches, saw $dataBatches")
    // parity: capped delivery loses and duplicates nothing
    assert(spark.table(out).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 3L))
    q.stop()

    // maxFilesPerTrigger=1: every snapshot here commits >= 1 fresh file,
    // so the same three commits again arrive one snapshot per batch
    spark.sql("INSERT INTO gtail5.s.feed VALUES (4, 4.0)")
    spark.sql("INSERT INTO gtail5.s.feed VALUES (5, 5.0)")
    val out2 = s"graft_tail5b_out_${System.nanoTime()}"
    val q2 = graft.catalog.CatalogStreams.readTable(spark, "gtail5.s.feed",
        Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName(out2)
      .outputMode("append").start()
    q2.processAllAvailable()
    val batches2 = q2.recentProgress.count(_.numInputRows > 0)
    assert(batches2 == 5, s"expected 5 file-capped batches, saw $batches2")
    assert(spark.table(out2).count() == 5)
    q2.stop()
  }

  test("expireSnapshots racing a LAGGING capped tail fails with the " +
      "expired-snapshot diagnostic at getBatch (ADVICE r13 #4 pin)") {
    // Drive the Source contract directly (Trigger.Once ignores
    // per-trigger caps, so a real harness query cannot be parked
    // mid-catch-up deterministically): one capped trigger leaves the
    // source's position at v2, maintenance destroys v2, and the next
    // cycle must (a) survive offset DISCOVERY via the first-pending
    // fallback and (b) fail the BATCH with the clear expired-snapshot
    // diagnostic — never silently skip or re-deliver.
    val wh = Files.createTempDirectory("graft_wh_tail6").toString
    spark.conf.set("spark.sql.catalog.gtail6", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail6.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail6.s")
    spark.sql("CREATE TABLE gtail6.s.feed (id BIGINT)")          // v1
    (1 to 5).foreach(i =>
      spark.sql(s"INSERT INTO gtail6.s.feed VALUES ($i)"))       // v2..v6
    val tableDir = java.nio.file.Paths.get(wh, "s", "feed")
    val meta = Files.createTempDirectory("graft_tail6_meta").toString
    val src = new graft.catalog.SnapshotStreamSource(spark, tableDir,
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType),
      meta, maxSnapshotsPerTrigger = Some(1), maxFilesPerTrigger = None)

    // two capped triggers: v1 (the empty CREATE snapshot), then v2 —
    // the tail is parked at v2 with four snapshots still pending
    // (batch DataFrames are streaming-flagged — any inspection trips the
    // batch-execution checker; the capped OFFSETS are the lag evidence)
    val off0 = src.getOffset.get
    assert(off0.json.trim == "1", s"capped first offset must be v1: $off0")
    src.getBatch(None, off0) // succeeds: v1 alive
    val off1 = src.getOffset.get
    assert(off1.json.trim == "2", s"capped second offset must be v2: $off1")
    src.getBatch(Some(off0), off1) // succeeds: v2 alive

    // maintenance expires history PAST the stream's position
    graft.catalog.Maintenance.expireSnapshots(spark, "gtail6.s.feed",
      keepLast = 1)

    // offset discovery survives (first-pending fallback, no baseline)
    val off2 = src.getOffset.get
    assert(off2.json.trim.toLong > 2L, s"fallback must admit progress: $off2")
    // ...but the batch fails loudly: its START snapshot is gone
    val err = intercept[IllegalStateException] {
      src.getBatch(Some(off1), off2)
    }
    assert(err.getMessage.contains("expired while a stream"),
      s"expected the expired-snapshot diagnostic, got: ${err.getMessage}")
  }

  test("a rewrite hidden INSIDE one batch range still fails the stream") {
    // add + COW-delete committed between two triggers: the dropped file
    // cancels out of the endpoint diff, so only per-snapshot validation
    // catches the append-only violation
    val wh = Files.createTempDirectory("graft_wh_tail4").toString
    spark.conf.set("spark.sql.catalog.gtail4", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail4.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail4.s")
    spark.sql("CREATE TABLE gtail4.s.feed (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gtail4.s.feed VALUES (1, 1.0)")
    val out = s"graft_tail4_out_${System.nanoTime()}"
    val q = graft.catalog.CatalogStreams.readTable(spark, "gtail4.s.feed")
      .writeStream.format("memory").queryName(out)
      .outputMode("append").start()
    q.processAllAvailable()
    // both commits land before the next trigger
    spark.sql("INSERT INTO gtail4.s.feed VALUES (2, 2.0), (3, 3.0)")
    spark.sql("DELETE FROM gtail4.s.feed WHERE id = 2")
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      q.awaitTermination(30000)
    }
    assert(err.getMessage.contains("non-append"), err.getMessage.take(300))
  }

  test("catalog tail resumes from a checkpoint without re-delivery") {
    // restart path: offsets come back from the checkpoint log as
    // SerializedOffset JSON, and the new batch must start AFTER the last
    // committed snapshot version — no duplicates, no gaps
    val wh = Files.createTempDirectory("graft_wh_tail3").toString
    spark.conf.set("spark.sql.catalog.gtail3", "graft.catalog.MetaCatalog")
    spark.conf.set("spark.sql.catalog.gtail3.warehouse", wh)
    spark.sql("CREATE NAMESPACE gtail3.s")
    spark.sql("CREATE TABLE gtail3.s.feed (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO gtail3.s.feed VALUES (1, 1.0), (2, 2.0)")

    val ckpt = Files.createTempDirectory("graft_tail3_ckpt").toString
    val outDir = Files.createTempDirectory("graft_tail3_out").toString
    def startQuery() =
      graft.catalog.CatalogStreams.readTable(spark, "gtail3.s.feed")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    assert(spark.read.parquet(outDir).count() == 2)

    // rows committed while the stream was DOWN arrive after restart
    spark.sql("INSERT INTO gtail3.s.feed VALUES (3, 3.0)")
    val q2 = startQuery()
    q2.processAllAvailable()
    spark.sql("INSERT INTO gtail3.s.feed VALUES (4, 4.0)")
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.read.parquet(outDir).collect().map(_.getLong(0)).toSeq
    assert(ids.sorted == Seq(1L, 2L, 3L, 4L), s"got $ids")
    assert(ids.distinct.size == ids.size, s"duplicates after restart: $ids")
  }

  test("session windows merge overlapping gap intervals (batch semantics)") {
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-01 00:04:00"), 1.0),   // < 5m gap: same session
      (1L, ts("2024-01-01 00:08:30"), 1.0),   // still chained (4.5m < gap)
      (1L, ts("2024-01-01 01:00:00"), 1.0),   // new session
      (2L, ts("2024-01-01 00:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = EventStreams.sessionAgg(events, "5 minutes")
      .orderBy("user_id", "win_start").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 3L), (1L, 1L), (2L, 1L)))
  }

  test("count-min sketch aggregates across streaming micro-batches " +
      "(complete mode) and equals the batch sketch") {
    // The CMS buffer serializes into the streaming aggregation state
    // store, so a live heavy-hitter monitor is the SAME operator as the
    // batch sketch — partials merged per micro-batch, counters exact.
    import graft.operators.HeavyHitters
    val dir = Files.createTempDirectory("graft_stream_cms").toFile
    val out = s"graft_cms_out_${System.nanoTime()}"
    val b1 = Seq((1L, "apple banana apple"), (2L, "cherry banana"))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, "apple date date"), (4L, "banana"))
      .toDF("doc_id", "text")
    b1.coalesce(1).write.parquet(s"$dir/b1")

    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = HeavyHitters.sketch(stream, "text", depth = 2, width = 32)
      .writeStream.format("memory").queryName(out)
      .outputMode("complete").start()
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(s"$dir/b2")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table(out).collect().head.getSeq[Long](0)
    val batch = HeavyHitters.sketch(b1.union(b2), "text", 2, 32)
      .collect().head.getSeq[Long](0)
    assert(streamed == batch)
    assert(streamed.sum == 9L * 2) // 9 words x depth
  }
}
