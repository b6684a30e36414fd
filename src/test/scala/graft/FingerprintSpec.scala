package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowFingerprints
import graft.operators.Fingerprint

class FingerprintSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Naive reference: direct k-gram hashes, explicit window minima. */
  private def naive(text: String, k: Int, w: Int): Seq[Long] = {
    val cps = text.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    val hashes = (0 until m).map { i =>
      (0 until k).foldLeft(0L)((h, j) =>
        (h * WinnowFingerprints.Base + cps(i + j)) % WinnowFingerprints.Mod)
    }
    val mins =
      if (m <= w) Seq(hashes.min)
      else (0 to m - w).map(i => hashes.slice(i, i + w).min)
    mins.distinct.sorted
  }

  private def kernel(text: String, k: Int, w: Int): Seq[Long] = {
    val out = spark.createDataset(Seq(text)).toDF("t")
      .select(Fingerprint.winnow(col("t"), k, w).as("fps"))
      .collect()(0).getSeq[Long](0)
    out
  }

  test("kernel matches the naive winnowing reference") {
    val rnd = new scala.util.Random(7)
    val alpha = "abcdefg h.,\nxyz"
    val samples = Seq(
      "", "a", "abcdefg",                      // n < k
      "abcdefgh",                              // exactly one k-gram
      "abcdefghij",                            // 1 < m <= w
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaa",                  // all-equal hashes (tie city)
      "héllo wörld — ünïcode test ünïcode test ünïcode") ++
      (1 to 20).map(_ => (1 to rnd.nextInt(120) + 1)
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString)
    for (s <- samples; (k, w) <- Seq((8, 4), (5, 3), (2, 1)))
      assert(kernel(s, k, w) == naive(s, k, w), s"text=$s k=$k w=$w")
  }

  test("winnowing guarantee: shared passage of length k+w-1 shares a fp") {
    val passage = "zqxwvutsrqponm" // 14 chars >= k+w-1 = 11 with k=8,w=4
    val a = "left context here " + passage + " and a tail"
    val b = "totally other prefix " + passage + " different end"
    assert(kernel(a, 8, 4).intersect(kernel(b, 8, 4)).nonEmpty)
  }

  test("overlapPairs finds planted near-dups, not disjoint docs") {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet hills far away from the noisy city tonight"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra trailing words appended"), // near-dup of 1
      (3L, "completely disjoint content speaking of spark catalyst " +
        "optimizer rules and tungsten memory format internals only")
    ).toDF("doc_id", "text")
    val pairs = Fingerprint.overlapPairs(docs, "doc_id", "text")
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("banded overlap: candidates verify to the same pairs as the full " +
      "self-join when passages span two windows") {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet hills far away from the noisy city tonight"
    val docs = Seq(
      (1L, base),
      (2L, base + " extra trailing words appended"),
      (3L, "completely disjoint content speaking of spark catalyst " +
        "optimizer rules and tungsten memory format internals only"),
      (4L, "another unrelated body of text about parquet row groups " +
        "and column chunk statistics in footers for pruning")
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("d1", "d2", "shared", "m1", "m2")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val full = rows(Fingerprint.overlapPairs(docs, "doc_id", "text")
      .select(col("d1"), col("d2"), col("shared"),
        col("m1").cast("bigint").as("m1"), col("m2").cast("bigint").as("m2")))
    val banded = rows(Fingerprint.overlapPairsBanded(docs, "doc_id", "text"))
    assert(banded == full && full.map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("banded overlap misses only sub-two-window passages (recall bound)") {
    // an 11-char shared passage (= k+w-1): guaranteed ONE shared
    // fingerprint, but never two consecutive shared minima — the banded
    // candidate step is allowed to (and here does) skip it
    val passage = "zqxwvutsrqp" // 11 chars, k=8 w=4
    val docs = Seq(
      (1L, "left context here " + passage + " and a tail"),
      (2L, "totally other prefix " + passage + " different end")
    ).toDF("doc_id", "text")
    val full = Fingerprint.overlapPairs(docs, "doc_id", "text",
      minJaccard = 0.01)
    val banded = Fingerprint.overlapPairsBanded(docs, "doc_id", "text",
      minJaccard = 0.01)
    assert(full.count() == 1 && banded.count() == 0)
  }

  test("maxDocFreq guard drops ubiquitous fingerprints without new exchanges") {
    // A boilerplate passage shared by ALL docs: with the guard at
    // cap < 4 its fingerprints vanish, so no pair survives jaccard 0.5.
    val boiler = "this license header appears in every single document here"
    val docs = (1L to 4L).map(i =>
      (i, boiler + s" unique tail $i" + ("x" * i.toInt))).toDF("doc_id", "text")
    val guarded = Fingerprint.overlapPairs(docs, "doc_id", "text",
      minJaccard = 0.5, maxDocFreq = Some(3))
    val open = Fingerprint.overlapPairs(docs, "doc_id", "text",
      minJaccard = 0.5, maxDocFreq = None)
    assert(open.count() > 0 && guarded.count() == 0)
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect { case e: Exchange => e }.size
    assert(exchanges(guarded) == exchanges(open),
      "doc-freq guard must ride the join's own fp partitioning")
  }
}
