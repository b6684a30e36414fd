package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text canonicalization for curation pipelines: Unicode normalization
  * plus the cheap mojibake signal (U+FFFD replacement-character count —
  * each one is a byte sequence some earlier decoder could not read).
  * Runs BEFORE dedup/token counting: "école" composed and decomposed
  * are different strings to a hash but the same document to a model
  * (the reference has no text surface — lib.rs:678; pipeline extension
  * layer like [[TextAnalysis]]).
  *
  * Plan shape at 100 TB: pure per-row projections over one scan — no
  * shuffle, no state; the [[graft.functions.UnicodeNormalize]] kernel
  * stays inside whole-stage codegen and returns ASCII rows untouched,
  * so on mostly-ASCII web text the pass is almost free. */
object Normalize {

  /** `java.text.Normalizer` as a codegen Column (form: NFC/NFD/NFKC/NFKD). */
  def unicode(text: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graftaccess.Internals.column(
      graft.functions.UnicodeNormalize(
        org.apache.spark.sql.graftaccess.Internals.expression(text), form))

  /** Count of U+FFFD replacement characters — the standard signal for
    * upstream decode corruption (mojibake). */
  def replacementCount(text: Column): Column =
    (length(text) - length(replace(text, lit("�"), lit("")))).cast("long")

  /** Per-document canonicalization profile: the NFC text, whether
    * normalization changed anything, and the mojibake count — the
    * columns a curation pipeline filters and re-keys on. */
  def profile(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), col(textCol).as("__t"),
        unicode(col(textCol), "NFC").as("nfc_text"))
      .select(col(idCol), col("nfc_text"),
        (col("__t") =!= col("nfc_text")).as("changed"),
        replacementCount(col("__t")).as("n_repl"))

  /** DuckDB replay of [[profile]] (utf8proc `nfc_normalize`; see the
    * Unicode-version caveat on [[graft.functions.UnicodeNormalize]]). */
  def oracleSql(table: String, idCol: String, textCol: String): String =
    s"""SELECT $idCol, nfc_normalize($textCol) AS nfc_text,
       |  $textCol <> nfc_normalize($textCol) AS changed,
       |  CAST(length($textCol) - length(replace($textCol, chr(65533), ''))
       |    AS BIGINT) AS n_repl
       |FROM $table ORDER BY $idCol""".stripMargin

  /** HTML → text extraction (the WET-style pass a web corpus runs
    * before every text operator), as a fixed regex/replace chain both
    * engines replay identically. Order matters and is part of the
    * contract: script and style blocks go FIRST (their raw-text bodies
    * may contain bare `<` that the generic tag regex would over-eat),
    * then comments, then tags, then entities — named entities before
    * `&amp;` so `&amp;lt;` decodes to the literal `&lt;` (one decode
    * pass, like the spec). Java regexes stay lookahead-free with
    * inline (?is) flags so DuckDB RE2 runs the SAME patterns (options
    * string 'gis' — DuckDB's `.` does NOT match newlines by default;
    * the 's' option is load-bearing for multi-line blocks). */
  private val HtmlBlockPatterns = Seq(
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?s)<!--.*?-->",
    "<[^>]*>")

  /** Decode order is significant: `&amp;` LAST. */
  private val HtmlEntities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  def stripHtml(text: Column): Column =
    org.apache.spark.sql.graftaccess.Internals.column(stripHtmlExpr(
      org.apache.spark.sql.graftaccess.Internals.expression(text)))

  /** [[stripHtml]] as a raw Catalyst expression tree — shared with the
    * SQL-surface registration (DFCompat `strip_html`). */
  def stripHtmlExpr(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace, StringReplace}
    val noMarkup = HtmlBlockPatterns.foldLeft(e)(
      (acc, p) => RegExpReplace(acc, Literal(p), Literal("")))
    HtmlEntities.foldLeft(noMarkup) { case (acc, (ent, r)) =>
      StringReplace(acc, Literal(ent), Literal(r))
    }
  }

  /** [[stripHtml]] as DuckDB SQL over the expression `inner` — the
    * same patterns with (?is)/(?s) carried in the options string. */
  def stripHtmlSql(inner: String): String = {
    val noMarkup = HtmlBlockPatterns.foldLeft(inner) { (acc, p) =>
      val opts = if (p.startsWith("(?is)")) "gis"
        else if (p.startsWith("(?s)")) "gs" else "g"
      val bare = p.replace("(?is)", "").replace("(?s)", "")
      s"regexp_replace($acc, '${bare.replace("'", "''")}', '', '$opts')"
    }
    HtmlEntities.foldLeft(noMarkup) { case (acc, (e, r)) =>
      s"replace($acc, '${e.replace("'", "''")}', '${r.replace("'", "''")}')"
    }
  }
}
