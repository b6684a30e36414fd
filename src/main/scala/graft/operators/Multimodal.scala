package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata (builder-prompt extension surface).
  *
  * The Spark-side shape is real and tested — schema, partition-parallel
  * `mapPartitions` decode, frame sampling as a generator — while the
  * codec step itself is a clearly-marked deterministic STUB (the
  * container ships no image/audio libraries; in production the body of
  * [[MultimodalOps.decodeStub]] is replaced by an actual decoder, and the
  * surrounding plumbing — batching per partition, no driver collection,
  * fixed-width feature vectors — is exactly what would run at 100 TB).
  */
object Multimodal {

  final case class MediaItem(
      media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, duration_ms: Long)

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float])

  val Kinds = Seq("image", "audio", "video")

  /** Build a deterministic media table from `documents` (text bytes stand
    * in for the binary payload; metadata derived from doc stats). */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaItem] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Kinds), (col("doc_id") % 3 + 1).cast("int"))
          .as("kind"),
        encode(col("text"), "UTF-8").as("content"),
        (col("n_chars") % 1920 + 1).cast("int").as("width"),
        (col("n_chars") % 1080 + 1).cast("int").as("height"),
        (col("n_chars") * 40).as("duration_ms"))
      .as[MediaItem]
  }

  /** Ingest a directory of real binary files as media rows via Spark's
    * `binaryFile` source (the production entry point for image/audio
    * payloads; kind inferred from the file extension). */
  def readBinaryDir(spark: SparkSession, path: String): Dataset[MediaItem] = {
    import spark.implicits._
    val ext = element_at(split(col("path"), "\\."), -1)
    spark.read.format("binaryFile").load(path)
      .select(
        xxhash64(col("path")).as("media_id"),
        when(ext.isin("png", "jpg", "jpeg", "gif"), "image")
          .when(ext.isin("wav", "mp3", "flac"), "audio")
          .when(ext.isin("mp4", "mkv", "webm"), "video")
          .otherwise("image").as("kind"),
        col("content"),
        lit(0).as("width"), lit(0).as("height"),
        (length(col("content")) * 8).cast("long").as("duration_ms"))
      .as[MediaItem]
  }

  /** STUB decode: deterministic 8-dim "feature vector" from the payload
    * bytes. Replace with a real codec in production — the signature and
    * the partition-parallel execution are the contract. */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Float](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Partition-parallel feature extraction. Runs on executors; nothing is
    * collected to the driver. */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      MediaFeatures(m.media_id, m.kind, m.content.length,
        decodeStub(m.content))
    })
  }

  /** STUB resize: deterministic re-sample of the payload to a byte budget
    * proportional to the target dimensions. Real plumbing: rows are
    * processed in fixed-size batches per partition — the shape a GPU/SIMD
    * codec needs (hand a batch to the library, get a batch back) — and
    * metadata (width/height) updates with the payload. Replace the loop
    * body with the real resampler in production. */
  def resize(media: Dataset[MediaItem], targetW: Int, targetH: Int,
      batchSize: Int = 64): Dataset[MediaItem] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch => // batched codec-call shape
        batch.map { m =>
          if (m.content.isEmpty) m.copy(width = targetW, height = targetH)
          else {
            val budget = math.max(1, targetW * targetH / 64)
            val out = new Array[Byte](math.min(budget, m.content.length))
            var i = 0
            while (i < out.length) { // deterministic stride re-sample
              out(i) = m.content((i.toLong * m.content.length / out.length).toInt)
              i += 1
            }
            m.copy(content = out, width = targetW, height = targetH)
          }
        }
      }
    }
  }

  /** STUB augmentation: each input row fans out to `variants` output rows
    * (original + deterministic transforms — here byte-reverse and cyclic
    * shift stand in for flip/rotate). The contract that matters at scale:
    * fan-out happens on executors (flatMap), never via a driver loop, and
    * the variant id is part of the row so downstream dedup/shuffle keys
    * stay unique. */
  def augment(media: Dataset[MediaItem], variants: Int = 3): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      (0 until variants).map {
        case 0 => (m.media_id, 0, m.content)
        case 1 => (m.media_id, 1, m.content.reverse)
        case v =>
          val shift = v % math.max(1, m.content.length)
          (m.media_id, v, m.content.drop(shift) ++ m.content.take(shift))
      }
    }.toDF("media_id", "variant", "content")
  }

  /** pHash-style 64-component perceptual signature: the decoded payload
    * is binned into 64 energies (STUB: cyclic byte-histogram bins; in
    * production the 8×8 low-frequency DCT block of the decoded image —
    * same shape, same downstream math), and each bin is sign'd against
    * the item's mean energy — the classic pHash "coefficient > median"
    * construction. Emitted as a ±1 sign VECTOR (array<bigint>) so media
    * near-dup rides the SAME banded machinery as text SimHash:
    * [[graft.functions.SimHashBands]] keys, [[Dedup.bandedCandidates]]
    * skew guard, [[graft.functions.HammingSigns]] verify — all
    * cross-engine-oracled via q_simhash_md5. */
  def phashSigns(media: Dataset[MediaItem]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val bins = new Array[Double](64)
      var i = 0
      while (i < m.content.length) {
        bins(i % 64) += (m.content(i) & 0xff) / 255.0
        i += 1
      }
      val mean = bins.sum / 64
      (m.media_id, bins.map(b => if (b > mean) 1L else -1L))
    }).toDF("media_id", "sv")
  }

  /** Media near-duplicate pairs by pHash Hamming distance — the named
    * media analogue of [[Dedup.simhashPairs]]: 4×16-bit band keys over
    * the sign vector, skew-guarded bucket join for candidates, kernel
    * Hamming verify of candidates only. Two items within Hamming
    * `maxHamming` ≤ 3 must agree on ≥1 band, so recall at the near-dup
    * thresholds matches text SimHash. Nothing quadratic materializes;
    * the shuffle carries (id, band, key) triples. */
  def mediaNearDupPairs(media: Dataset[MediaItem], maxHamming: Int = 3,
      maxBucket: Int = 4096): DataFrame = {
    import org.apache.spark.sql.graftaccess.Internals
    val base = phashSigns(media)
      .repartition(col("media_id")) // parallelism before the banding work
    val banded = base.select(col("media_id").as("id"),
      posexplode(Internals.column(graft.functions.SimHashBands(
        Internals.expression(col("sv"))))).as(Seq("band", "key")))
    val cand = Dedup.bandedCandidates(banded, maxBucket)
    cand
      .join(base.select(col("media_id").as("ida"), col("sv").as("sva")), "ida")
      .join(base.select(col("media_id").as("idb"), col("sv").as("svb")), "idb")
      .select(col("ida"), col("idb"),
        Internals.column(graft.functions.HammingSigns(
          Internals.expression(col("sva")),
          Internals.expression(col("svb")))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Frame sampling for video rows: one output row per sampled frame
    * offset (every `everyMs` milliseconds of duration). */
  def sampleFrames(media: Dataset[MediaItem], everyMs: Long): DataFrame =
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))).as("frame_offset_ms"))
}
