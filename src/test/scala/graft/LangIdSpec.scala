package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LangId

/** Language ID: the built-in trigram profiles discriminate real
  * natural-language sentences, the script dispatch catches CJK, the
  * train path learns profiles that classify their own corpus, and the
  * dispatch fallbacks are deterministic. */
class LangIdSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def classified(docs: Seq[(Long, String)]): Map[Long, String] =
    LangId.classify(docs.toDF("doc_id", "text"), "doc_id", "text",
        LangId.profilesDf(spark))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("built-in profiles identify natural-language sentences") {
    val out = classified(Seq(
      1L -> ("the quick brown fox jumps over the lazy dog and then " +
        "the cat is sitting in the house with all of the others"),
      2L -> ("der schnelle braune fuchs springt über den faulen hund " +
        "und die katze ist mit dem kind in der schule geblieben"),
      3L -> ("le renard brun rapide saute par dessus le chien et les " +
        "enfants sont dans la maison avec une question pour eux"),
      4L -> ("el rápido zorro marrón salta sobre el perro perezoso y " +
        "los niños están en la casa con una pregunta del día"),
      5L -> ("la volpe marrone salta sopra il cane pigro e che i " +
        "bambini sono nella casa per una domanda della scuola")))
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "it"))
  }

  test("CJK script dispatch overrides the trigram vote") {
    val out = classified(Seq(
      1L -> "今天天气很好我们一起去公园散步吧",
      // mostly-Latin text with a stray CJK char stays with the vote
      2L -> "the weather is good today so the others went to the 公 park"))
    assert(out(1L) == "zh")
    assert(out(2L) == "en")
  }

  test("script dispatch ladder: ja/ko/ru/ar/hi land on their script, " +
      "not a confidently wrong Latin label (VERDICT r10 #3)") {
    val out = classified(Seq(
      // Japanese mixes kanji with kana — the kana check runs BEFORE
      // Han, so this must NOT come back 'zh' (nor a Latin vote)
      1L -> "今日はいい天気なので公園へ散歩に行きましょう",
      2L -> "きょうは いい てんき です ね さんぽ に いきましょう",
      3L -> "오늘은 날씨가 좋아서 공원에 산책하러 갑니다",
      4L -> "сегодня хорошая погода и мы идем гулять в парк",
      5L -> "الطقس جميل اليوم لنذهب إلى الحديقة للتنزه",
      6L -> "आज मौसम अच्छा है चलो पार्क में टहलने चलते हैं",
      // pure-Han stays zh (the ja check must not swallow it)
      7L -> "今天天气很好我们一起去公园散步吧"))
    assert(out == Map(1L -> "ja", 2L -> "ja", 3L -> "ko", 4L -> "ru",
      5L -> "ar", 6L -> "hi", 7L -> "zh"))
  }

  test("margin column is the top1-minus-top2 vote gap; 0 when fewer " +
      "than two languages scored (VERDICT r10 #7)") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then " +
        "the cat is sitting in the house with all of the others"),
      (2L, "zzz qqq")).toDF("doc_id", "text")
    val out = LangId.classify(docs, "doc_id", "text",
        LangId.profilesDf(spark), margin = true)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    val (lang1, score1, margin1) = out(1L)
    assert(lang1 == "en" && score1 > 0L)
    assert(margin1 > 0L && margin1 <= score1,
      s"confident en text must have a positive margin, got $margin1")
    assert(out(2L) == (("und", 0L, 0L)))
    // a doc hitting exactly ONE language's grams: margin == score
    val model = LangId.train(
      Seq(("xx", "aaa bbb ccc"), ("yy", "ddd eee fff")).toDF("lang", "text"),
      "lang", "text", k = 10)
    val solo = LangId.classify(Seq((9L, "aaa bbb ccc")).toDF("doc_id", "text"),
        "doc_id", "text", model, margin = true)
      .collect().head
    assert(solo.getString(1) == "xx")
    assert(solo.getLong(3) == solo.getLong(2), "single-language vote: margin == score")
  }

  test("no profile gram at all classifies as 'und' with score 0") {
    val out = LangId.classify(
        Seq((7L, "zzz qqq"), (8L, "")).toDF("doc_id", "text"),
        "doc_id", "text", LangId.profilesDf(spark))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSet == Set((7L, "und", 0L), (8L, "und", 0L)))
  }

  test("deterministic alphabetical tiebreak on equal scores") {
    // one gram that is worth the same points in two languages: " th"
    // is en-only, so craft a text hitting exactly one shared-score pair
    // via the trained path instead — two labels, identical corpora
    val docs = Seq((1L, "aaa bbb"), (2L, "aaa bbb")).toDF("doc_id", "text")
    val model = LangId.train(
      Seq(("xx", "aaa bbb"), ("yy", "aaa bbb")).toDF("lang", "text"),
      "lang", "text", k = 5)
    val out = LangId.classify(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.values.forall(_ == "xx")) // xx < yy, same score
  }

  test("CharGrams kernel equals the declarative normalize+charGrams chain") {
    // the kernel is the hot path; the declarative chain is the
    // reference the DuckDB oracle replays — they must agree byte-wise,
    // including whitespace runs at the ends (collapsed, NOT trimmed),
    // sub-n-char inputs, multi-byte chars, and case folding
    val tricky = Seq(
      "", " ", "  ", "a", "ab", "abc", "  leading", "trailing \t ",
      "tab\tand\nnewlinevtab\fff\rcr", "many   spaces   here",
      "MiXeD Case ÉÀÜ ß İstanbul ΣΙΣΥΦΟΣ", "今天 天气 很好",
      "a b nbsp is not \\s", "emoji 😀😀 pair")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = tricky.toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
        LangId.gramsOf(col("text")).as("k"),
        LangId.charGrams(LangId.normalize(col("text"))).as("d"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: kernel ${r.getSeq[String](1)} != " +
          s"declarative ${r.getSeq[String](2)}")
    }
  }

  test("train learns profiles that classify their own languages") {
    val corpus = Seq(
      ("en", "the cat is in the house and the dog is with the child"),
      ("en", "all of the children are in the school with their things"),
      ("de", "die katze ist in dem haus und der hund ist bei dem kind"),
      ("de", "alle kinder sind in der schule mit ihren sachen und büchern"))
      .toDF("lang", "text")
    val model = LangId.train(corpus, "lang", "text", k = 25)
    // the model is (gram, lang, pts) with pts descending by rank
    val m = model.collect()
    assert(m.forall(_.getInt(2) >= 1) && m.forall(_.getInt(2) <= 25))
    val out = LangId.classify(Seq(
        (1L, "the dog is in the house with the child"),
        (2L, "der hund ist in dem haus bei dem kind"))
      .toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "en", 2L -> "de"))
  }
}
