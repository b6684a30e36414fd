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

  /** Exploded (idCol, pos, line, fp) lines plus the surviving subset
    * after the corpus-frequency anti join — the shared core of
    * [[dedupLines]] and [[dedupLinesProfile]]. Frequency counting and
    * the membership join key on md5(line): 16-byte shuffle rows
    * instead of line text (2^-128 collision accepted, same note as the
    * contamination probe's hash join). */
  private def keptLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): (DataFrame, DataFrame) = {
    require(minDocs >= 2, "minDocs < 2 would drop every line")
    val lines = df.select(col(idCol),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("fp", md5(col("line")))
    val boiler = lines.groupBy("fp")
      .agg(count_distinct(col(idCol)).as("nd"))
      .where(col("nd") >= minDocs).select("fp")
    (lines, lines.join(boiler, Seq("fp"), "left_anti"))
  }

  private def rebuild(kept: DataFrame, idCol: String): DataFrame =
    kept.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("pos"), col("line"))))
        .as("__a"))
      .select(col(idCol),
        array_join(expr("transform(__a, x -> x.line)"), "\n")
          .as("clean_text"),
        size(col("__a")).cast("long").as("__n_kept"))

  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    val (_, kept) = keptLines(df, idCol, textCol, minDocs)
    rebuild(kept, idCol).select(col(idCol), col("clean_text"))
  }

  /** [[dedupLines]] plus the curation bookkeeping a pipeline reports:
    * every input document is RETAINED (an all-boilerplate doc comes
    * back with empty clean_text rather than disappearing — the caller
    * decides the drop policy) with exact (n_lines, n_dropped) counts.
    * Same line semantics as [[dedupLines]]: `\n` split with trailing
    * empties kept, empty lines dedup like any other. */
  def dedupLinesProfile(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 2): DataFrame = {
    val (_, kept) = keptLines(df, idCol, textCol, minDocs)
    df.select(col(idCol),
        size(split(col(textCol), "\n")).cast("long").as("n_lines"))
      .join(rebuild(kept, idCol), Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_dropped"))
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
