package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextAnalysis

/** Character-entropy kernel: exact codepoint counts, the -sum(p log2 p)
  * entropy against hand-computed and property references, codepoint
  * (not UTF-16) units, and the degenerate cases. */
class CharEntropySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def profile(s: String): (Long, Long, Double) = {
    val r = Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.charProfile(col("t")).as("p"))
      .select(col("p.n_chars"), col("p.distinct_chars"), col("p.char_entropy"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("counts and entropy match hand-computed references") {
    // "aab": p(a)=2/3, p(b)=1/3 → H = log2(3) - 2/3 ≈ 0.918295834054
    val (n, d, h) = profile("aab")
    assert(n == 3L && d == 2L)
    assert(math.abs(h - 0.9182958340544896) < 1e-12)
    // uniform over 4 chars → exactly 2 bits
    val (_, d4, h4) = profile("abcd")
    assert(d4 == 4L && math.abs(h4 - 2.0) < 1e-12)
    // single repeated char → zero entropy (and not -0.0)
    val (n1, d1, h1) = profile("aaaa")
    assert(n1 == 4L && d1 == 1L && h1 == 0.0)
    assert(1.0 / h1 > 0, "entropy must be +0.0, not -0.0")
    // empty doc → all zeros
    assert(profile("") == ((0L, 0L, 0.0)))
  }

  test("units are codepoints: multi-byte and astral chars count once") {
    // 2-byte é, 3-byte 中, 4-byte (astral) 𝄞 — one codepoint each
    val (n, d, _) = profile("aé中" + new String(Character.toChars(0x1d11e)))
    assert(n == 4L && d == 4L)
    // non-ASCII path merges with the ASCII counts: a é a é → 2 distinct
    val (n2, d2, h2) = profile("aéaé")
    assert(n2 == 4L && d2 == 2L && math.abs(h2 - 1.0) < 1e-12)
  }

  test("kernel equals a declarative per-char recompute on varied docs") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaaaaaaaabbbbbbbbbb"),
      (3L, "x"),
      (4L, "ABCabc123!@# \t\n mixed éü今天")
    ).toDF("doc_id", "text")
    val kernel = TextAnalysis.entropyProfile(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // declarative reference: explode per char, groupBy count, entropy
    val ref = docs.select(col("doc_id"),
        explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").count()
      .groupBy("doc_id").agg(
        sum("count").as("n"),
        count(lit(1)).as("d"),
        (-sum(expr("count * log2(count)")) / sum("count") +
          expr("log2(sum(count))")).as("h"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    for ((id, (n, d, h)) <- kernel) {
      val (rn, rd, rh) = ref(id)
      assert(n == rn && d == rd, s"doc $id counts")
      assert(math.abs(h - rh) <= 1e-9 * math.max(math.abs(h), 1.0),
        s"doc $id entropy $h vs $rh")
    }
  }
}
