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
}
