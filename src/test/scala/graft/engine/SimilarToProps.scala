package graft.engine

import org.scalacheck.{Gen, Prop, Properties}

/** Property-based laws for the SIMILAR TO → RLIKE translation.
  * Expression-level (the produced regex is evaluated directly after
  * undoing the Spark-literal escaping), so ScalaCheck can hammer
  * thousands of cases without a Spark job per sample. */
object SimilarToProps extends Properties("SimilarTo") {

  /** Evaluate `value SIMILAR TO pattern ESCAPE esc` via the translated
    * regex (undoing the SQL-literal encoding the engine emits). */
  private def matches(pattern: String, value: String,
      esc: Char = '\\'): Boolean = {
    val forLiteral = Engine.similarToRegex(pattern, esc)
    val javaRx = forLiteral.replace("\\\\", "\\").replace("''", "'")
    java.util.regex.Pattern.matches(javaRx, value)
  }

  private val word: Gen[String] = Gen.alphaNumStr
  private val wordNE: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val SpecialChars = "%_[]()|?*+.^$\\{}"

  property("a plain pattern matches exactly itself") =
    Prop.forAll(word) { s =>
      matches(s, s) && !matches(s, s + "x") && !matches(s, "x" + s)
    }

  property("% matches any (alphanumeric) expansion at its position") =
    Prop.forAll(word, word, word) { (pre, mid, post) =>
      matches(pre + "%" + post, pre + mid + post)
    }

  property("_ matches exactly one character") =
    Prop.forAll(word, Gen.alphaNumChar, word) { (pre, c, post) =>
      matches(pre + "_" + post, pre + c + post) &&
        !matches(pre + "_" + post, pre + post)
    }

  property("an escaped special char is that literal char, any escape") =
    Prop.forAll(Gen.oneOf(SpecialChars.toSeq), Gen.oneOf('#', '!', '~', '\\')) {
      (special, esc) =>
        matches(s"$esc$special", special.toString, esc) &&
          !matches(s"$esc$special", "q", esc)
    }

  property("alternation picks either branch, bracket class any member") =
    Prop.forAll(wordNE, wordNE) { (a, b) =>
      matches(s"($a|$b)", a) && matches(s"($a|$b)", b) &&
        matches(s"[${a.head}${b.head}]", b.head.toString)
    }

  property("anchoring: % only at the declared end") =
    Prop.forAll(wordNE, wordNE) { (s, extra) =>
      // The negative clause only holds when the probe string does not
      // itself start with `s` (e.g. s="L", extra="L" → "LLL" DOES match
      // 'L%' under Postgres semantics — the engine is right to say so).
      val probe = extra + s + extra
      matches(s + "%", s + extra) &&
        (probe.startsWith(s) || !matches(s + "%", probe))
    }
}
