package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen expression —
  * the first transform every web-corpus curation pipeline applies
  * (composed-vs-decomposed accents, ligatures, full-width forms all
  * hash differently until normalized, silently defeating exact dedup
  * and token counting; the reference engine has no text surface —
  * lib.rs:678 — this is part of the pipeline extension layer).
  *
  * Spark has no built-in for this, and a Scala UDF would pay
  * serialization + boxing per row; this stays inside whole-stage
  * codegen and short-circuits the dominant case: a pure-ASCII string
  * (numBytes == numChars) is normalized under EVERY form and is
  * returned as-is with zero allocation, and a non-ASCII string that is
  * already normalized (Normalizer.isNormalized — a scan, no rewrite)
  * returns the input UTF8String untouched.
  *
  * Semantics are `java.text.Normalizer` (ICU-equivalent for the
  * standard forms). The DuckDB oracle side is utf8proc's
  * `nfc_normalize` — identical on the standard compositions the specs
  * pin; exotic post-Unicode-13 additions could in principle differ by
  * engine Unicode version (documented, not observable on this corpus).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(UnicodeKernels.FormNames.contains(form),
    s"form must be one of ${UnicodeKernels.FormNames.mkString("/")}, got $form")

  private val ord = java.text.Normalizer.Form.valueOf(form).ordinal

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    UnicodeKernels.normalize(input.asInstanceOf[UTF8String], ord)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, in =>
      s"graft.functions.UnicodeKernels.normalize($in, $ord)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "unicode_normalize"
}

object UnicodeKernels {

  val FormNames: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  private val Forms = java.text.Normalizer.Form.values()

  /** Normalize to `Forms(ord)`; returns the INPUT object when already
    * normalized (ASCII fast path needs no scan at all). */
  def normalize(s: UTF8String, ord: Int): UTF8String = {
    // one byte per char == pure ASCII == normalized under every form
    if (s.numBytes == s.numChars) return s
    val f = Forms(ord)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }
}
