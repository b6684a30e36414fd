package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style line-level corpus dedup (boilerplate removal): drop every
  * line that occurs in at least `minDocs` distinct documents — cookie
  * banners, "subscribe" calls, navigation chrome — and rebuild each
  * document from its surviving lines in original order. This is the C4
  * pipeline's "three-sentence" rule at line granularity (Raffel et al.
  * 2020, §2.2 of the T5 paper: lines occurring ≥3 times in the corpus
  * are removed once discovered).
  *
  * Scale shape: lines explode inside the scan stage; the corpus-wide
  * line-frequency aggregate map-side combines before one shuffle on the
  * line (a 100 TB run would shuffle a 16-byte line hash instead of the
  * line text — same plan, narrower rows); the membership join shuffles
  * on the same key; the rebuild is one groupBy(doc) whose
  * collect_list(struct(pos, line)) is bounded by single-document size.
  * Documents whose every line is boilerplate disappear from the output
  * (C4 drops emptied documents too).
  */
object Boilerplate {

  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would drop every line")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freq = lines.groupBy("line")
      .agg(countDistinct(col(idCol)).as("line_docs"))
    lines.join(freq, "line")
      .where(col("line_docs") < minDocs)
      .groupBy(idCol)
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")),
        "\n").as("clean_text"))
  }

  /** DuckDB oracle replaying [[dedupLines]] over relation `rel(id,
    * text)`: same explode/count/join, ordered string_agg rebuild. */
  def oracleSql(rel: String, idCol: String, minDocs: Int): String =
    s"""s AS (SELECT $idCol, string_split(text, chr(10)) AS ls FROM $rel),
       |l AS (SELECT $idCol, generate_subscripts(ls, 1) AS pos,
       |        unnest(ls) AS line FROM s),
       |f AS (SELECT line, count(DISTINCT $idCol) AS line_docs
       |      FROM l GROUP BY 1),
       |k AS (SELECT l.$idCol, l.pos, l.line FROM l JOIN f USING (line)
       |      WHERE f.line_docs < $minDocs)""".stripMargin
}
