package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction for training-data curation
  * (builder-prompt extension surface). Pure regex projections — both
  * detection counts and redaction pipeline inside the scan stage with
  * zero shuffle, which is the only shape that survives 100 TB: PII
  * scrubbing is embarrassingly parallel and must never become a join.
  *
  * Patterns are deliberately ASCII-conservative so the same regex text
  * is valid in Java's engine (Spark) and RE2 (DuckDB oracle) with
  * identical match semantics — no lookbehind, no backreferences, no
  * Unicode classes.
  */
object Pii {

  /** category → (pattern, replacement tag), applied in this order.
    * Email first (its local part can contain digits and dots that the
    * later numeric patterns would otherwise chew on); SSN before phone
    * (both are dashed digit groups, the shapes are disjoint but the
    * order makes the intent explicit); bare IPv4 last. */
  // Explicit [a-zA-Z] classes, not (?i): inline flags are unevenly
  // supported across RE2 configs, while widened classes behave the same
  // in Java regex and RE2 — 'John.Doe@Gmail.COM' must redact too.
  val Patterns: Seq[(String, String, String)] = Seq(
    ("email", "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("ssn", "\\d{3}-\\d{2}-\\d{4}", "<SSN>"),
    ("phone", "\\d{3}-\\d{3}-\\d{4}", "<PHONE>"),
    ("ipv4", "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}", "<IP>"))

  /** Per-category match counts (Spark regexp_count returns INT — the
    * DuckDB oracle casts its BIGINT len(regexp_extract_all)). */
  def detect(text: Column): Seq[(String, Column)] =
    Patterns.map { case (cat, pat, _) =>
      cat -> regexp_count(text, lit(pat))
    }

  /** All categories redacted, in [[Patterns]] order (Spark
    * regexp_replace is replace-ALL; the DuckDB oracle needs the 'g'
    * flag to match). */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (_, pat, tag)) =>
      regexp_replace(acc, pat, tag)
    }

  /** Detection + redaction projection over a corpus. */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val counts = detect(t).map { case (cat, c) => c.as(s"n_$cat") }
    df.select(col(idCol) +: counts :+ redact(t).as("redacted"): _*)
  }
}
