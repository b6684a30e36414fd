package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Normalize

/** Unicode canonicalization: the kernel implements java.text.Normalizer
  * semantics for all four forms, the ASCII/already-normalized fast
  * paths return the input untouched, and the profile operator emits
  * the curation columns (nfc_text, changed, n_repl). All non-ASCII
  * codepoints are spelled as \u escapes so no editor/tool can silently
  * re-normalize the fixtures. */
class NormalizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Composed = "\u00e9cole"        // LATIN SMALL E WITH ACUTE
  private val Decomposed = "e\u0301cole"     // e + COMBINING ACUTE

  private def norm(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(Normalize.unicode(col("t"), form)).collect().head.getString(0)

  test("NFC composes, NFD decomposes, K-forms fold compatibility chars") {
    assert(norm(Decomposed, "NFC") == Composed)
    assert(norm(Composed, "NFD") == Decomposed)
    // NFC is NOT compatibility folding: the fi ligature (U+FB01) survives
    assert(norm("\ufb01le", "NFC") == "\ufb01le")
    // NFKC folds it, plus full-width and circled forms
    assert(norm("\ufb01le", "NFKC") == "file")
    assert(norm("\uff21\uff22\uff23", "NFKC") == "ABC") // full-width ABC
    assert(norm("\u2460", "NFKC") == "1")      // circled one
    assert(norm("\u00e9", "NFKD") == "e\u0301")
    // idempotent
    assert(norm(norm(Decomposed, "NFC"), "NFC") == Composed)
  }

  test("ASCII and already-normalized inputs pass through; nulls stay null") {
    assert(norm("plain ascii text 123", "NFC") == "plain ascii text 123")
    assert(norm(Composed, "NFC") == Composed)
    val out = Seq((1L, Composed), (2L, null.asInstanceOf[String]))
      .toDF("id", "t")
      .select(col("id"), Normalize.unicode(col("t"), "NFC").as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).contains(Composed) && out(2L).isEmpty)
    // matches java.text.Normalizer on a mixed doc, all forms
    val tricky = "Ca\u0301fe\u0301 \ufb01ne \uff24\uff25 \u212b x\u0323\u0302"
    for (f <- Seq("NFC", "NFD", "NFKC", "NFKD"))
      assert(norm(tricky, f) == java.text.Normalizer.normalize(tricky,
        java.text.Normalizer.Form.valueOf(f)), s"form $f")
    // invalid form is rejected at construction
    intercept[IllegalArgumentException] { Normalize.unicode(col("t"), "NFX") }
  }

  test("stripHtml removes blocks/comments/tags in order and decodes " +
      "entities once, ampersand last") {
    def strip(s: String): String =
      Seq(Tuple1(s)).toDF("t")
        .select(Normalize.stripHtml(col("t"))).collect().head.getString(0)
    // script body with a bare `<` — must go before the generic tag rule
    assert(strip("a<script>\nif (x < 2) { y(); }\n</script>b") == "ab")
    assert(strip("a<STYLE media=\"x\">p {c: d}\n</style>b") == "ab")
    assert(strip("a<!-- multi\nline -->b") == "ab")
    assert(strip("<p class=\"m\">hi</p><br/>") == "hi")
    // one decode pass: &amp;lt; is the LITERAL string "&lt;", not "<"
    assert(strip("A &amp; B &amp;lt; &lt;i&gt; &quot;q&quot; &#39;s&#39;&nbsp;.")
      == "A & B &lt; <i> \"q\" 's' .")
    // plain text unchanged
    assert(strip("no markup here 1 < 2") == "no markup here 1 < 2")
  }

  test("profile emits nfc_text/changed/n_repl; U+FFFD counted on the raw text") {
    val docs = Seq(
      (1L, "plain ascii"),
      (2L, Decomposed),                            // changes under NFC
      (3L, "bad \ufffd bytes \ufffd here"),  // two replacement chars
      (4L, Composed)                               // already NFC
    ).toDF("doc_id", "text")
    val out = Normalize.profile(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getBoolean(2), r.getLong(3)))).toMap
    assert(out(1L) == (("plain ascii", false, 0L)))
    assert(out(2L) == ((Composed, true, 0L)))
    assert(out(3L) == (("bad \ufffd bytes \ufffd here", false, 2L)))
    assert(out(4L) == ((Composed, false, 0L)))
  }
}
