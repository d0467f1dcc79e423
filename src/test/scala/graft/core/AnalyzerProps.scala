package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Property suite for the pinned analyzer (SURVEY.md §5.2 `analyzer`). */
object AnalyzerProps extends Properties("Analyzer") {

  property("no empty tokens") = forAll(Gen.asciiPrintableStr) { s =>
    Analyzer.tokenize(s).forall(_.nonEmpty)
  }

  property("tokens are lowercase alnum") = forAll(Gen.asciiPrintableStr) { s =>
    Analyzer.tokenize(s).forall(_.forall(c => c.isLetterOrDigit && !c.isUpper))
  }

  property("matches straightforward reference impl") = forAll(Gen.asciiPrintableStr) { s =>
    val ref = s.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").filter(_.nonEmpty).toSeq
    Analyzer.tokenize(s).toSeq == ref
  }

  property("null/empty safe") = Prop {
    Analyzer.tokenize(null).isEmpty && Analyzer.tokenize("").isEmpty &&
      Analyzer.tokenize("  .,;  ").isEmpty
  }

  property("known example") = Prop {
    Analyzer.tokenize("Hello, World! x2  ").toSeq == Seq("hello", "world", "x2")
  }

  // --- non-ASCII parity (VERDICT r2 item 8) --------------------------------
  // The fallback path must equal the reference pipeline (whole-string Java
  // lowercase then \p{L}\p{N} split — the Column form's exact semantics)
  // on arbitrary unicode, INCLUDING the contextual-casing traps İ and Σ.

  private val unicodeChar: Gen[Char] = Gen.frequency(
    4 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '.', ',', '-', '_', '!', '\n', '\t'),
    2 -> Gen.oneOf("àéîõüÀÉÎÕÜßẞçÇñÑ".toSeq),
    2 -> Gen.oneOf("ΑΒΓΔΣΩαβγδσςωΣΙΓΜ".toSeq),
    2 -> Gen.oneOf("БГДЖЗЛПФЦЧбгджзлпфчц".toSeq),
    1 -> Gen.oneOf("日本語中文한국어ひらがなカタカナ".toSeq),
    1 -> Gen.oneOf("İıⅫ٠١٢٣①".toSeq), // dotted-İ, Turkish ı, Nl/No numerals
    1 -> Gen.oneOf('́', '̇')) // combining marks
  private val unicodeStr: Gen[String] = Gen.listOf(unicodeChar).map(_.mkString)

  // DEFAULT-locale lowercase: what Spark's lower() applies to non-full-
  // ASCII strings (UTF8String.toLowerCaseSlow), hence what the typed
  // fallback must mirror (ADVICE r3; en-locale CI: identical to ROOT)
  private def referencePipeline(s: String): Seq[String] =
    s.toLowerCase()
      .split(Analyzer.TokenSplitRegex).filter(_.nonEmpty).toSeq

  property("unicode: fallback equals the Column-form pipeline") =
    forAll(unicodeStr) { s => Analyzer.tokenize(s).toSeq == referencePipeline(s) }

  property("unicode: contextual-casing traps pinned") = Prop {
    // İstanbul: lower-then-split yields (i, stanbul) — U+0307 is a separator
    Analyzer.tokenize("İstanbul").toSeq == Seq("i", "stanbul") &&
      // final sigma: Java contextual mapping inside the engine
      Analyzer.tokenize("ΑΣ ΣΙΓΜΑ").toSeq ==
        Seq("ας", "σιγμα")
  }
}
