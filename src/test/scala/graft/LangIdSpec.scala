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
      2L -> ("der schnelle braune fuchs springt \u00fcber den faulen hund " +
        "und die katze ist mit dem kind in der schule geblieben"),
      3L -> ("le renard brun rapide saute par dessus le chien et les " +
        "enfants sont dans la maison avec une question pour eux"),
      4L -> ("el r\u00e1pido zorro marr\u00f3n salta sobre el perro perezoso y " +
        "los ni\u00f1os est\u00e1n en la casa con una pregunta del d\u00eda"),
      5L -> ("la volpe marrone salta sopra il cane pigro e che i " +
        "bambini sono nella casa per una domanda della scuola")))
    assert(out == Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es",
      5L -> "it"))
  }

  test("CJK script dispatch overrides the trigram vote") {
    val out = classified(Seq(
      1L -> "\u4eca\u5929\u5929\u6c14\u5f88\u597d\u6211\u4eec\u4e00\u8d77\u53bb\u516c\u56ed\u6563\u6b65\u5427",
      // mostly-Latin text with a stray CJK char stays with the vote
      2L -> "the weather is good today so the others went to the \u516c park"))
    assert(out(1L) == "zh")
    assert(out(2L) == "en")
  }

  test("script dispatch ladder: ja/ko/ru/ar/hi land on their script, " +
      "not a confidently wrong Latin label (VERDICT r10 #3)") {
    val out = classified(Seq(
      // Japanese mixes kanji with kana \u2014 the kana check runs BEFORE
      // Han, so this must NOT come back 'zh' (nor a Latin vote)
      1L -> "\u4eca\u65e5\u306f\u3044\u3044\u5929\u6c17\u306a\u306e\u3067\u516c\u5712\u3078\u6563\u6b69\u306b\u884c\u304d\u307e\u3057\u3087\u3046",
      2L -> "\u304d\u3087\u3046\u306f \u3044\u3044 \u3066\u3093\u304d \u3067\u3059 \u306d \u3055\u3093\u307d \u306b \u3044\u304d\u307e\u3057\u3087\u3046",
      3L -> "\uc624\ub298\uc740 \ub0a0\uc528\uac00 \uc88b\uc544\uc11c \uacf5\uc6d0\uc5d0 \uc0b0\ucc45\ud558\ub7ec \uac11\ub2c8\ub2e4",
      4L -> ("\u0441\u0435\u0433\u043e\u0434\u043d\u044f \u0445\u043e\u0440\u043e\u0448\u0430\u044f \u043f\u043e\u0433\u043e\u0434\u0430 \u0438 \u043c\u044b \u0438\u0434\u0435\u043c \u0433\u0443\u043b\u044f\u0442\u044c \u0432 \u043f\u0430\u0440\u043a"),
      5L -> ("\u0627\u0644\u0637\u0642\u0633 \u062c\u0645\u064a\u0644 \u0627\u0644\u064a\u0648\u0645 \u0644\u0646\u0630\u0647\u0628 \u0625\u0644\u0649 \u0627\u0644\u062d\u062f\u064a\u0642\u0629 \u0644\u0644\u062a\u0646\u0632\u0647"),
      6L -> ("\u0906\u091c \u092e\u094c\u0938\u092e \u0905\u091a\u094d\u091b\u093e \u0939\u0948 \u091a\u0932\u094b \u092a\u093e\u0930\u094d\u0915 \u092e\u0947\u0902 \u091f\u0939\u0932\u0928\u0947 \u091a\u0932\u0924\u0947 \u0939\u0948\u0902"),
      // pure-Han stays zh (the ja check must not swallow it)
      7L -> "\u4eca\u5929\u5929\u6c14\u5f88\u597d\u6211\u4eec\u4e00\u8d77\u53bb\u516c\u56ed\u6563\u6b65\u5427"))
    assert(out == Map(1L -> "ja", 2L -> "ja", 3L -> "ko", 4L -> "ru",
      5L -> "ar", 6L -> "hi", 7L -> "zh"))
  }

  test("trained-script profiles: ru/ar/hi win the VOTE with dispatch " +
      "disabled, and a below-threshold mixed doc no longer falls to " +
      "'und' (VERDICT r11 #8)") {
    // dispatch off entirely: the trigram vote alone must identify the
    // script-dispatch languages' native-script text
    val voteOnly = LangId.classify(Seq(
        4L -> ("\u0441\u0435\u0433\u043e\u0434\u043d\u044f \u0445\u043e\u0440\u043e\u0448\u0430\u044f \u043f\u043e\u0433\u043e\u0434\u0430 \u0438 " +
          "\u043c\u044b \u0438\u0434\u0435\u043c \u0433\u0443\u043b\u044f\u0442\u044c \u0432 \u043f\u0430\u0440\u043a"),
        5L -> ("\u0627\u0644\u0637\u0642\u0633 \u062c\u0645\u064a\u0644 \u0627\u0644\u064a\u0648\u0645 \u0644\u0646\u0630\u0647\u0628 " +
          "\u0625\u0644\u0649 \u0627\u0644\u062d\u062f\u064a\u0642\u0629 \u0644\u0644\u062a\u0646\u0632\u0647"),
        6L -> ("\u0906\u091c \u092e\u094c\u0938\u092e \u0905\u091a\u094d\u091b\u093e \u0939\u0948 \u091a\u0932\u094b " +
          "\u092a\u093e\u0930\u094d\u0915 \u092e\u0947\u0902 \u091f\u0939\u0932\u0928\u0947 \u091a\u0932\u0924\u0947 \u0939\u0948\u0902"))
        .toDF("doc_id", "text"),
        "doc_id", "text", LangId.profilesDf(spark), cjkThreshold = 2.0)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(voteOnly == Map(4L -> "ru", 5L -> "ar", 6L -> "hi"))
    // dispatch ON at the default 0.3: a Cyrillic phrase diluted with
    // enough digits sits BELOW the script threshold — before the
    // trained profiles this fell to the Latin-only vote and came back
    // 'und'; now the vote itself labels it
    val mixed = "\u0441\u0435\u0433\u043e\u0434\u043d\u044f \u043f\u043e\u0433\u043e\u0434\u0430 " +
      "0123456789 0123456789 0123456789 0123456789 0123456789 0123456789"
    val cyr = mixed.count(c => c >= '\u0400' && c <= '\u04ff')
    assert(cyr.toDouble / mixed.length < 0.3, "fixture must sit below dispatch")
    val out = LangId.classify(Seq(9L -> mixed).toDF("doc_id", "text"),
        "doc_id", "text", LangId.profilesDf(spark))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(9L) == "ru")
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
    // via the trained path instead \u2014 two labels, identical corpora
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
    // reference the DuckDB oracle replays \u2014 they must agree byte-wise,
    // including whitespace runs at the ends (collapsed, NOT trimmed),
    // sub-n-char inputs, multi-byte chars, and case folding
    val tricky = Seq(
      "", " ", "  ", "a", "ab", "abc", "  leading", "trailing \t ",
      "tab\tand\nnewlinevtab\fff\rcr", "many   spaces   here",
      "MiXeD Case \u00c9\u00c0\u00dc \u00df \u0130stanbul \u03a3\u0399\u03a3\u03a5\u03a6\u039f\u03a3", "\u4eca\u5929 \u5929\u6c14 \u5f88\u597d",
      "a\u00a0b nbsp is not \\s", "emoji \ud83d\ude00\ud83d\ude00 pair")
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
      ("de", "alle kinder sind in der schule mit ihren sachen und b\u00fcchern"))
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
