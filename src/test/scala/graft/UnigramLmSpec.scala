package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLm

/** Unigram-LM tokenizer training (Viterbi hard-EM): hand-computed tiny
  * corpora, tie determinism, the coverage floor, the out-of-domain word
  * contract, and partition invariance. */
class UnigramLmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) =
    rows.toSeq.toDF("doc_id", "text")

  test("viterbi kernel segments by probability product with smallest-start ties") {
    import graft.functions.{TokenizeKernels, ViterbiSegment}
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put("a", 0.25); m.put("b", 0.25); m.put("ab", 0.5)
    // "ab" as one piece: p=0.5 beats a·b = 0.0625
    val out = TokenizeKernels.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("abab"), m, 2)
    assert(out.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq == Seq("ab", "ab"))
    // tie: p(ab) = p(a)·p(b) → 0.25·0.25 = 0.0625 each; smallest start
    // j wins at every position, so the LONGER last piece is chosen
    val m2 = new java.util.HashMap[String, java.lang.Double]()
    m2.put("a", 0.25); m2.put("b", 0.25); m2.put("ab", 0.0625)
    val out2 = TokenizeKernels.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab"), m2, 2)
    assert(out2.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq == Seq("ab"))
    // unreachable char → null (the operator's coverage floor prevents
    // this for in-corpus text)
    assert(TokenizeKernels.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString("az"), m, 2) == null)
    val _ = ViterbiSegment // touch the case class for coverage
  }

  test("train learns the repeated compound as one piece") {
    // 'abab' dominates: the seed contains 'abab' (maxPieceLen=4), and
    // after one E-step every 'abab' word segments as the single piece
    val df = corpus((1L, "abab abab abab abab ab"), (2L, "abab abab cd"))
    val v = UnigramLm.train(df, "text", maxPieceLen = 4, minCount = 2,
        seedSize = 50, maxWordLen = 12, iters = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(v("abab") == 6L, s"expected the compound piece to win: $v")
    assert(v.contains("ab")) // the standalone word keeps its piece
  }

  test("single-char coverage floor survives rounds where chars lose every segmentation") {
    // 'xy' always segments as the pair piece, so 'x'/'y' get zero
    // Viterbi count — the floor must re-seed them at count 1 each round
    val df = corpus((1L, "xy xy xy xy"))
    val v = UnigramLm.train(df, "text", maxPieceLen = 2, minCount = 2,
        seedSize = 50, maxWordLen = 12, iters = 3)
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(v("xy") == 4L)
    assert(v("x") == 1L && v("y") == 1L, s"coverage floor lost: $v")
  }

  test("words past maxWordLen are out of the model domain for train AND encode") {
    val df = corpus((1L, "short superduperextralongword short"))
    val v = UnigramLm.train(df, "text", maxPieceLen = 3, minCount = 1,
      seedSize = 500, maxWordLen = 6, iters = 1)
    assert(!v.select("piece").as[String].collect().exists(_.contains("super")))
    val enc = UnigramLm.encode(df, "doc_id", "text", maxPieceLen = 3,
        minCount = 1, seedSize = 500, maxWordLen = 6, iters = 1)
      .select(explode($"syms").as("p")).as[String].collect()
    assert(enc.forall(p => !"superduperextralongword".contains(p) ||
      "short".contains(p)), s"out-of-domain word leaked: ${enc.toSeq}")
  }

  test("viterbi kernel windows by CODE POINTS, not UTF-16 units") {
    import graft.functions.TokenizeKernels
    // "x😀yz" is 4 code points but 5 UTF-16 units: with maxPieceLen=4
    // the whole-word piece must be reachable (a UTF-16 window would
    // exclude it and split the word instead)
    val wordS = "x\uD83D\uDE00yz"
    val m = new java.util.HashMap[String, java.lang.Double]()
    m.put(wordS, 0.9)
    for (ch <- Seq("x", "\uD83D\uDE00", "y", "z")) m.put(ch, 0.01)
    val out = TokenizeKernels.viterbi(
      org.apache.spark.unsafe.types.UTF8String.fromString(wordS), m, 4)
    assert(out.toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq == Seq(wordS))
  }

  test("piece tie-breaks use UTF-8 byte order (supplementary chars AFTER U+E000)") {
    // U+E000 (private use) and the emoji (U+1F600) tie on count; UTF-8
    // order ranks U+E000 first, Java UTF-16 order would rank the
    // surrogate-led emoji first — ranks must follow UTF-8 (the engine
    // and oracle collation)
    val df = corpus((1L, "\uE000 \uD83D\uDE00 \uE000 \uD83D\uDE00"))
    val ranked = UnigramLm.train(df, "text", maxPieceLen = 1, minCount = 1,
        seedSize = 10, maxWordLen = 4, iters = 1)
      .orderBy("rank").collect().map(_.getString(1)).toSeq
    assert(ranked == Seq("\uE000", "\uD83D\uDE00"), ranked)
  }

  test("pruning shrinks to targetSize but single chars always survive") {
    val df = corpus((1L, "abab abab abab cd cd ef"))
    val v = UnigramLm.train(df, "text", maxPieceLen = 4, minCount = 1,
        seedSize = 100, maxWordLen = 12, iters = 2, targetSize = 2)
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val pieces = v.map(_._1).toSet
    // the two dominant pieces survive the cut...
    assert(pieces.contains("abab") && pieces.contains("cd"), v.toSeq)
    // ...every corpus char is still present (coverage floor) and
    // nothing else is
    for (ch <- "abcdef") assert(pieces.contains(ch.toString), v.toSeq)
    assert(v.length == 2 + 6, v.toSeq)
  }

  test("maxMatch kernel is greedy-longest-first with whole-word UNK fallback") {
    import graft.functions.MaxMatchKernel
    def seg(word: String, vocab: Seq[String], maxLen: Int) = {
      val s = new java.util.HashSet[String](); vocab.foreach(s.add)
      val out = MaxMatchKernel.maxMatch(
        org.apache.spark.unsafe.types.UTF8String.fromString(word), s,
        maxLen, org.apache.spark.unsafe.types.UTF8String.fromString("[UNK]"))
      out.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
    }
    // greedy takes 'abc' even though 'ab'+'cd' would cover better later:
    // leftover 'd' still matches, so greedy = abc, d
    assert(seg("abcd", Seq("abc", "ab", "cd", "d"), 3) == Seq("abc", "d"))
    // greedy DEAD END → whole word collapses to [UNK] (c unmatchable)
    assert(seg("abc", Seq("abc", "ab"), 2) == Seq("[UNK]"))
    // code-point window: 4-cp piece with a supplementary char reachable
    // at maxLen 4
    assert(seg("x\uD83D\uDE00yz", Seq("x\uD83D\uDE00yz"), 4)
      == Seq("x\uD83D\uDE00yz"))
  }

  test("maxMatchEncode covers the corpus under the trained vocab") {
    val df = corpus((1L, "abab cd abab"))
    val enc = UnigramLm.maxMatchEncode(df, "doc_id", "text",
        maxPieceLen = 4, minCount = 1, seedSize = 100, maxWordLen = 12,
        iters = 2)
      .select($"doc_id", array_join($"syms", " ").as("s"))
      .as[(Long, String)].collect().toMap
    // coverage floor guarantees no [UNK] for in-corpus text, and word
    // order/boundaries hold
    assert(!enc(1L).contains("[UNK]"))
    assert(enc(1L).replace(" ", "") == "ababcdabab")
  }

  test("encode flattens pieces in document word order") {
    val df = corpus((1L, "abab cd abab"))
    val enc = UnigramLm.encode(df, "doc_id", "text", maxPieceLen = 4,
        minCount = 1, seedSize = 100, maxWordLen = 12, iters = 2)
      .select($"doc_id", array_join($"syms", " ").as("s"))
      .as[(Long, String)].collect().toMap
    // whatever the exact segmentation, word boundaries and order hold:
    // the concatenation with spaces removed equals the original words
    assert(enc(1L).replace(" ", "") == "ababcdabab")
  }

  test("training is partition-invariant (1 vs 13 partitions, exact equality)") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(parts: Int) =
      UnigramLm.train(docs.repartition(parts), "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSeq
    assert(run(1) == run(13))
  }
}
