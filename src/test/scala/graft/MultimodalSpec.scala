package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val media = Multimodal.mediaFromDocuments(
    Tables.load(spark, "/root/testdata/sf0.001", "documents"))

  test("media table covers all kinds with opaque binary payloads") {
    val kinds = media.toDF().groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("image", "audio", "video"))
    assert(kinds.values.sum == 500)
  }

  test("feature extraction is partition-parallel and deterministic") {
    val a = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    val b = Multimodal.extractFeatures(media).collect()
      .map(f => f.media_id -> f.feature.toSeq).toMap
    assert(a == b)
    assert(a.values.forall(_.length == 8))
  }

  test("n_bytes matches payload length") {
    val f = Multimodal.extractFeatures(media).filter(_.media_id == 3L)
      .collect().head
    val m = media.filter(_.media_id == 3L).collect().head
    assert(f.n_bytes == m.content.length)
  }

  test("near-duplicate media surfaces via feature-vector cosine dedup") {
    // the multimodal->similarity composition: extractFeatures feeds the
    // same near-dup operator the embeddings pipeline uses. A lightly
    // corrupted copy of a payload must pair with its original; an
    // unrelated payload must not.
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    // the 8-bucket stub averages away IN-bucket structure, so distinct
    // media must differ in their mod-8 byte profile (as real feature
    // vectors differ in direction, not length)
    val base = Array.tabulate(4096)(i => ((i % 8) * 30).toByte)
    val nearDup = base.clone(); nearDup(7) = 0; nearDup(99) = 1
    val other = Array.tabulate(4096)(i => ((7 - i % 8) * 30).toByte)
    val items = Seq(
      Multimodal.MediaItem(1L, "image", base, 8, 8, 0L),
      Multimodal.MediaItem(2L, "image", nearDup, 8, 8, 0L),
      Multimodal.MediaItem(3L, "image", other, 8, 8, 0L)).toDS()
    val feats = Multimodal.extractFeatures(items).toDF()
      .select(col("media_id"), col("feature"))
    val pairs = graft.operators.Similarity
      .cosineNearDupPairsExact(feats, "media_id", "feature", 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L)), s"expected only the planted dup, got $pairs")
  }

  test("pHash near-dup: exact copies pair at 0, light corruption within 3, unrelated not") {
    import spark.implicits._
    val m = media.filter(_.media_id < 40).collect()
    val exact = m.find(_.media_id == 7L).get.copy(media_id = 1007L)
    val corrupted = {
      val src = m.find(_.media_id == 8L).get
      val bytes = src.content.clone()
      var i = 0
      while (i < bytes.length) { bytes(i) = (bytes(i) ^ 0x1).toByte; i += 64 }
      src.copy(media_id = 1008L, content = bytes)
    }
    val corpus = spark.createDataset(m :+ exact :+ corrupted)
    val pairs = Multimodal.mediaNearDupPairs(corpus, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 7L && p._2 == 1007L && p._3 == 0))
    assert(pairs.exists(p => p._1 == 8L && p._2 == 1008L))
    // unrelated media don't flood in: planted pairs dominate the output
    assert(!pairs.exists(p => p._1 == 7L && p._2 == 8L))
    // the verify stage runs the kernel, not an interpreted lambda
    val plan = Multimodal.mediaNearDupPairs(corpus, maxHamming = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hamming_signs") && !plan.contains("zip_with"))
  }

  test("binaryFile source ingests real files with kind inference") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bin")
    java.nio.file.Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3))
    java.nio.file.Files.write(dir.resolve("b.wav"), Array[Byte](4, 5))
    java.nio.file.Files.write(dir.resolve("c.mp4"), Array[Byte](6))
    val media = Multimodal.readBinaryDir(spark, dir.toString)
    val kinds = media.collect().map(m => m.kind -> m.content.length).toMap
    assert(kinds == Map("image" -> 3, "audio" -> 2, "video" -> 1))
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 3 && feats.forall(_.feature.length == 8))
  }

  test("resize survives empty payloads") {
    val s = spark
    import s.implicits._
    val one = Seq(Multimodal.MediaItem(1L, "image", Array.empty[Byte], 0, 0, 0L)).toDS()
    val out = Multimodal.resize(one, 64, 64).collect().head
    assert(out.width == 64 && out.height == 64 && out.content.isEmpty)
  }

  test("resize sets target dims and bounds payload to the byte budget") {
    val resized = Multimodal.resize(media, 64, 64).collect()
    assert(resized.forall(m => m.width == 64 && m.height == 64))
    assert(resized.forall(_.content.length <= 64 * 64 / 64))
    // deterministic: same input → identical payloads
    val again = Multimodal.resize(media, 64, 64).collect()
      .map(m => m.media_id -> m.content.toSeq).toMap
    assert(resized.forall(m => again(m.media_id) == m.content.toSeq))
  }

  test("augment fans out variants on executors with stable variant ids") {
    val out = Multimodal.augment(media, variants = 3)
    assert(out.count() == media.count() * 3)
    val byVariant = out.groupBy("variant").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byVariant == Map(0 -> 500L, 1 -> 500L, 2 -> 500L))
    // variant 1 is the byte-reverse of variant 0
    val row = out.filter("media_id = 3").collect()
      .map(r => r.getInt(1) -> r.getAs[Array[Byte]](2).toSeq).toMap
    assert(row(1) == row(0).reverse)
  }

  test("frame sampling yields ceil(duration/step) frames for videos") {
    val frames = Multimodal.sampleFrames(media, 5000)
      .groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val durations = media.filter(_.kind == "video").collect()
      .map(m => m.media_id -> m.duration_ms).toMap
    assert(frames.keySet == durations.keySet)
    durations.foreach { case (id, d) =>
      assert(frames(id) == (d - 1) / 5000 + 1, s"media $id duration $d")
    }
  }
}
