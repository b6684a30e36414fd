package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Contamination, Mixing, Pii, Repetition}

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("dupStats measures repeated n-grams, zero on distinct text") {
    val docs = Seq(
      (1L, "spam spam spam spam"),           // pure repetition
      (2L, "all four words differ"),         // none
      (3L, "ab")                             // shorter than 3 words
    ).toDF("doc_id", "text")
    val out = Repetition.dupStats(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Double]("dup_word_frac") == 0.75)
    assert(out(0).getAs[Double]("dup_2gram_frac") > 0.6)   // "spam spam" x3
    assert(out(1).getAs[Double]("dup_word_frac") == 0.0)
    assert(out(1).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(out(2).getAs[Double]("dup_3gram_frac") == 0.0)  // no 3-grams
  }

  test("topNgramShare finds the dominant bigram and drops gramless docs") {
    val docs = Seq(
      (1L, "a b a b a b"),    // "a b" occurs 3 of 5 bigrams
      (2L, "solo")            // no bigrams -> absent from output
    ).toDF("doc_id", "text")
    val out = Repetition.topNgramShare(docs, "doc_id", "text", 2).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_grams") == 5L)
    assert(out(0).getAs[Long]("top_cnt") == 3L)
  }

  test("Pii.scrub counts and redacts every category, leaves clean text") {
    val docs = Seq(
      (1L, "mail bob.1@corp.io call 555-123-4567 ssn 123-45-6789 host 10.0.0.1"),
      (2L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Pii.scrub(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_email") == 1)
    assert(out(0).getAs[Int]("n_phone") == 1)
    assert(out(0).getAs[Int]("n_ssn") == 1)
    assert(out(0).getAs[Int]("n_ipv4") == 1)
    assert(out(0).getAs[String]("redacted") ==
      "mail <EMAIL> call <PHONE> ssn <SSN> host <IP>")
    assert(out(1).getAs[String]("redacted") == "nothing sensitive here")
    // redaction is a fixpoint: a second pass detects nothing
    val again = Pii.scrub(
      out.toSeq.map(r => (r.getLong(0), r.getString(5))).toDF("doc_id", "text"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(again.forall(r => (1 to 4).forall(i => r.getInt(i) == 0)))
  }

  test("Contamination.overlap flags only docs sharing a verbatim n-gram") {
    val bench = Seq((100L, "the capital of france is paris obviously"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "we know the capital of france is paris obviously today"),  // copies 6-grams
      (2L, "the capital of spain is madrid obviously not"),            // no shared 6-gram
      (3L, "completely unrelated words in this document here")
    ).toDF("doc_id", "text")
    val out = Contamination.overlap(corpus, bench, "doc_id", "text", 6)
      .orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out(0).getAs[Long]("n_shared") == 2L)  // two distinct shared 6-grams
  }

  test("temperature mixing upsamples tail sources, exact take counts") {
    // 900 docs from 'big', 100 from 'small': α=0.5 weights 30:10, so a
    // 200-doc budget takes 150/50 instead of the proportional 180/20.
    val docs = spark.range(1000).selectExpr("id AS doc_id",
      "CASE WHEN id < 900 THEN 'big' ELSE 'small' END AS source")
    assert(Mixing.temperatureTakes(
      Seq(("big", 900L), ("small", 100L)), 0.5, 200) ==
      Seq(("big", 150L), ("small", 50L)))
    val mixed = Mixing.exactMix(docs, "doc_id", "source", 0.5, 200)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 150L, "small" -> 50L))
    // determinism: same selection under different partitioning
    val again = Mixing.exactMix(docs.repartition(7), "doc_id", "source", 0.5, 200)
    assert(mixed.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // hashMix (zero-shuffle path) lands within ~3 sigma of the targets
    val hm = Mixing.hashMix(docs, "doc_id", "source", 0.5, 200)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(hm("big") - 150L) < 40 && math.abs(hm("small") - 50L) < 25,
      s"hashMix off target: $hm")
  }

  test("dedupLines drops corpus-frequent lines, keeps order, drops emptied docs") {
    import graft.operators.Boilerplate
    val boiler = "subscribe now"
    val docs = Seq(
      (1L, s"$boiler\nalpha one\nbeta two"),
      (2L, s"gamma three\n$boiler\ndelta four"),
      (3L, s"epsilon five\n$boiler"),
      (4L, boiler)) // all-boilerplate doc vanishes
      .toDF("doc_id", "text")
    val out = Boilerplate.dedupLines(docs, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("clean_text")))
    assert(out.toSeq == Seq(
      (1L, "alpha one\nbeta two"),
      (2L, "gamma three\ndelta four"),
      (3L, "epsilon five")))
    // threshold respected: at minDocs=5 nothing is frequent enough
    val loose = Boilerplate.dedupLines(docs, "doc_id", "text", 5)
    assert(loose.count() == 4)
  }

  test("gopher rules flag short, symbol-heavy, and stopword-free docs") {
    import graft.operators.GopherRules
    val good = (("the quick brown fox jumps over and over with that dog " * 5)
      .trim)
    val docs = Seq(
      (1L, good),                                  // passes everything
      (2L, "too short to keep"),                   // n_words < minWords
      (3L, ("#### " * 60).trim),                   // symbol ratio + alpha
      (4L, ("zebra lion puma " * 20).trim))        // no stopword hits
      .toDF("doc_id", "text")
    val out = GopherRules.qualityFlags(docs, "doc_id", "text", minWords = 10)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ==
      Seq(true, false, false, false))
    val m3 = out(2)
    assert(m3.getAs[Double]("symbol_ratio") > 0.1 &&
      m3.getAs[Double]("alpha_frac") < 0.8)
    assert(out(3).getAs[Int]("stop_hits") == 0)
  }

  test("normalizeUrl canonicalizes case, ports, fragments, tracking params") {
    import graft.operators.Urls
    val cases = Seq(
      // scheme+host lowercase, path case kept, default port dropped
      ("HTTP://WWW.Ex.COM:80/Path/A", "http://www.ex.com/Path/A"),
      ("https://Ex.com:443/x", "https://ex.com/x"),
      // non-default port survives
      ("http://ex.com:8080/x", "http://ex.com:8080/x"),
      // fragment stripped, params sorted, tracking dropped
      ("http://ex.com/a?z=2&utm_source=f&a=1#frag", "http://ex.com/a?a=1&z=2"),
      // tracking-only query collapses to no query
      ("http://ex.com/a?utm_campaign=x&fbclid=123", "http://ex.com/a"),
      // no scheme: string passes through the pipeline unharmed
      ("ex.com/Path?b=2&a=1", "ex.com/Path?a=1&b=2"),
      // whitespace trimmed
      ("  http://ex.com/  ", "http://ex.com/"))
    val got = cases.map(_._1).toDF("u")
      .select(Urls.normalizeUrl(col("u")).as("n"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
  }

  test("chunkWindows: overlap, clamped tail, wordless docs, bad stride") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7"), // window 4 stride 2: starts 0,2,4,6
      (2L, "a b"),                  // single short chunk
      (3L, "   ")                   // wordless: no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkWindows(docs, "doc_id", "text", 4, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 0L, 4L, "w1 w2 w3 w4"),
      (1L, 1L, 4L, "w3 w4 w5 w6"),
      (1L, 2L, 3L, "w5 w6 w7"),
      (1L, 3L, 1L, "w7"),
      (2L, 0L, 2L, "a b")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWindows(docs, "doc_id", "text", 4, 5)
    }
  }

  test("host extraction and the per-domain cap") {
    import graft.operators.Urls
    val cases = Seq(
      ("HTTP://WWW.Site.COM:80/Path", "site.com"),
      ("https://sub.Example.com/x?y=1", "sub.example.com"),
      ("site.com/path", "site.com"),      // scheme-less
      ("www.site.com", "site.com"),       // bare www host
      ("  http://Ex.com  ", "ex.com"))    // whitespace trimmed
    val got = cases.map(_._1).toDF("u")
      .select(Urls.host(col("u")).as("h"))
      .collect().map(_.getString(0)).toSeq
    assert(got == cases.map(_._2), s"got $got")
    // 30 docs on 3 hosts (www/case variants of the same site collapse),
    // cap 5 -> exactly 5 survivors per host, rn dense 1..5
    val docs = (0L until 30L).map(i =>
      (i, s"${if (i % 2 == 0) "http://WWW.Host" else "https://host"}${i % 3}.com/p$i"))
      .toDF("doc_id", "url")
    val out = Urls.capPerDomain(docs, "url", "doc_id", 5)
      .select("domain", "rn").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    assert(out.keys.toSet == Set("host0.com", "host1.com", "host2.com"))
    out.foreach { case (_, rns) => assert(rns == (1 to 5)) }
  }

  test("CodeRules signals and the Stack-default keep flag") {
    import graft.operators.CodeRules
    val docs = Seq(
      (1L, "def f(x):\n    return x + 1\n"),                // normal code
      (2L, "short\n" + "y" * 1500),                          // minified line
      (3L, "// AUTO-GENERATED, DO NOT EDIT\nval a = 1"),     // autogen
      (4L, ";;; !!! ??? ### $$$ %%% ^^^ &&& *** ((()))")    // symbol soup
    ).toDF("doc_id", "text")
    val out = CodeRules.filterFlags(docs, "doc_id", "text")
      .select("doc_id", "max_line_len", "alnum_frac", "autogen", "keep")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    assert(out(1L)._4, "plain code must pass")
    assert(out(2L)._1 == 1500L && !out(2L)._4, "minified line fails max_line_len")
    assert(out(3L)._3 && !out(3L)._4, "auto-generated header fails")
    assert(out(4L)._2 < 0.25 && !out(4L)._4, "symbol soup fails alnum_frac")
  }

  test("C4 rules: line keep predicate and page flags match the paper's " +
      "semantics; levels stay separate") {
    import graft.operators.C4Rules
    val docs = Seq(
      (1L, "This sentence is properly terminated.\nno punct here\n" +
        "Too few!\nEnds with a question mark?\n" +
        "Please enable javascript to continue.\nShe said \"stop\""),
      (2L, "lorem ipsum dolor sit amet.\nA normal closing sentence."),
      (3L, "var x = { a: 1 }\nReal prose stays here.")
    ).toDF("doc_id", "text")
    val out = C4Rules.clean(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    // doc 1: kept = terminated sentence, question-mark line, end-quote
    // line; dropped = no-punct, 2-word "Too few!", javascript line
    assert(out(1L) == (("This sentence is properly terminated.\n" +
      "Ends with a question mark?\nShe said \"stop\"", 6L, 3L, true)))
    // doc 2: lorem ipsum flags the PAGE but its line still passes the
    // LINE rules (levels are separate, like the paper)
    assert(out(2L) == (("lorem ipsum dolor sit amet.\n" +
      "A normal closing sentence.", 2L, 2L, false)))
    // doc 3: brace flags the page; the prose line is still kept
    assert(out(3L) == (("Real prose stays here.", 2L, 1L, false)))
  }

  test("readability counts words/sentences/syllable-heuristic and the " +
      "Flesch-Kincaid chain; floors guard degenerate docs") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      // 9 words, 2 sentences ('.' and '!'), syllables: the(1) cat(1)
      // sat(1) on(1) the(1) mat(1) it(1) was(1) happy(2 runs: a, y) = 10
      (1L, "The cat sat on the mat. It was happy!"),
      // no sentence punctuation → floor 1; "xyz" has the vowel-run "y",
      // "qrst" is vowel-less (floored to 1 syllable)
      (2L, "xyz qrst"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (w1, s1, y1, g1) = out(1L)
    assert((w1, s1, y1) == ((9L, 2L, 10L)))
    val expected1 = 0.39 * (9.0 / 2.0) + 11.8 * (10.0 / 9.0) - 15.59
    assert(math.abs(g1 - expected1) < 1e-12)
    val (w2, s2, y2, _) = out(2L)
    assert((w2, s2, y2) == ((2L, 1L, 2L)),
      "no punctuation floors sentences at 1; vowel-less words get 1 syllable")
    assert(out(3L) == ((0L, 1L, 0L, 0.0)), "empty doc → zero grade")
  }

  test("sentenceChunks: greedy sentence packing, oversized sentence owns " +
      "a chunk, empty doc yields none") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c. d e! f g h i j k? l"),
      (2L, "")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.sentenceChunks(docs, "doc_id", "text", maxWords = 5)
      .orderBy("doc_id", "chunk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(out.toSeq == Seq(
      (1L, 0, 2L, 5L, "a b c. d e!"),   // 3+2 fills the 5-word budget
      (1L, 1, 1L, 6L, "f g h i j k?"),  // 6 words: overflowing own chunk
      (1L, 2, 1L, 1L, "l")))            // break BEFORE l (0 room left)
  }

  test("blocklistFilter: distinct-hit counts, sorted list, keep flag") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "Bad bad APPLE and worse pear"), // 'bad' ×2 counts ONCE
      (2L, "all clean words here"),
      (3L, "worse")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.blocklistFilter(docs, "doc_id", "text",
        Seq("bad", "worse", "unused"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((2L, "bad,worse", false)),
      "lower-cased, repeated hit counted once, sorted list, keep=false")
    assert(out(2L) == ((0L, "", true)), "clean doc keeps with empty hits")
    assert(out(3L) == ((1L, "worse", false)))
  }
}
