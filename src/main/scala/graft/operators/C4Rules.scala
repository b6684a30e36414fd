package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning rules (Raffel et al. 2020, §2.2 — the T5 corpus
  * filter; the other half of the quality stack next to
  * [[GopherRules]], which post-dates it). Faithful to the paper's
  * split of responsibilities:
  *
  *  - LINE level: keep a line only if it ends in terminal punctuation
  *    (`.` `!` `?` or a closing quote), has at least `minLineWords`
  *    words (paper: 3), and does not contain the word "javascript"
  *    (case-insensitive) — the enable-JS boilerplate rule;
  *  - PAGE level: flag (not silently drop — the caller owns the drop
  *    policy) pages containing `{` (code) or "lorem ipsum"
  *    (placeholder text). The paper's bad-words list is deliberately
  *    out of scope (a policy list, not an algorithm).
  *
  * Every predicate is a plain string operation both engines run
  * identically, so the full output — rebuilt clean_text included —
  * hash-verifies against DuckDB.
  *
  * Plan shape at 100 TB: line rules are per-document-local, so this
  * is a SHUFFLE-FREE projection (split → HOF filter → join); unlike
  * [[Boilerplate.dedupLines]] no corpus-wide aggregate exists to pay
  * for. The HOF lambdas run interpreted per line — acceptable here
  * because the alternative (explode + codegen filter + rebuild)
  * buys codegen at the price of a full shuffle of the corpus. */
object C4Rules {

  /** Per-line keep predicate, exposed for composition. */
  def lineKeep(line: Column, minLineWords: Int = 3): Column =
    line.rlike("[.!?\"]$") &&
      size(filter(split(line, "\\s+"), w => w =!= "")) >= minLineWords &&
      !lower(line).contains("javascript")

  /** (idCol, clean_text, n_lines, n_kept, keep_doc): line-filtered
    * text with exact counts and the page-level flag. */
  def clean(df: DataFrame, idCol: String, textCol: String,
      minLineWords: Int = 3): DataFrame = {
    val lines = split(col(textCol), "\n")
    val kept = filter(lines, l => lineKeep(l, minLineWords))
    df.select(col(idCol),
      array_join(kept, "\n").as("clean_text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"),
      (!col(textCol).contains("{") &&
        !lower(col(textCol)).contains("lorem ipsum")).as("keep_doc"))
  }

  /** DuckDB replay of [[clean]] — same predicates, same rebuild. */
  def oracleSql(table: String, idCol: String, textCol: String,
      minLineWords: Int = 3): String =
    s"""WITH s AS (SELECT $idCol, string_split($textCol, chr(10)) AS ls,
       |    $textCol AS t FROM $table),
       |c AS (SELECT $idCol, CAST(len(ls) AS BIGINT) AS n_lines,
       |  list_filter(ls, l -> regexp_matches(l, '[.!?"]$$')
       |    AND len(list_filter(string_split_regex(lower(l), '\\s+'),
       |      x -> x <> '')) >= $minLineWords
       |    AND NOT contains(lower(l), 'javascript')) AS kept,
       |  NOT contains(t, '{') AND NOT contains(lower(t), 'lorem ipsum')
       |    AS keep_doc
       |  FROM s)
       |SELECT $idCol, array_to_string(kept, chr(10)) AS clean_text,
       |  n_lines, CAST(len(kept) AS BIGINT) AS n_kept, keep_doc
       |FROM c ORDER BY $idCol""".stripMargin
}
