package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Porter stemmer pinned against the published algorithm's own examples
  * (Porter 1980, "An algorithm for suffix stripping" — every pair below
  * appears verbatim in the paper's rule tables / worked examples).
  */
class EnSpec extends AnyFunSuite {

  private val paperVectors = Seq(
    // step 1a
    "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
    "caress" -> "caress", "cats" -> "cat",
    // step 1b
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    // step 1b cleanup
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file",
    // step 1c
    "happy" -> "happi", "sky" -> "sky",
    // step 2
    "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
    "valenci" -> "valenc", "hesitanci" -> "hesit", "digitizer" -> "digit",
    "conformabli" -> "conform", "radicalli" -> "radic", "differentli" -> "differ",
    "vileli" -> "vile", "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper", "feudalism" -> "feudal",
    "decisiveness" -> "decis", "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit", "sensibiliti" -> "sensibl",
    // step 3
    "triplicate" -> "triplic", "formative" -> "form", "formalize" -> "formal",
    "electriciti" -> "electr", "electrical" -> "electr", "hopeful" -> "hope",
    "goodness" -> "good",
    // step 4
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
    "defensible" -> "defens", "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend", "adoption" -> "adopt",
    "homologou" -> "homolog", "communism" -> "commun", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog", "effective" -> "effect",
    "bowdlerize" -> "bowdler",
    // step 5
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("Porter stemmer matches every example in the published paper") {
    val bad = paperVectors.collect {
      case (w, want) if En.stem(w) != want => s"$w -> ${En.stem(w)} (want $want)"
    }
    assert(bad.isEmpty, s"mismatches:\n${bad.mkString("\n")}")
  }

  test("stemmer is idempotent-safe on short words and chains with stopwords") {
    assert(En.stem("a") == "a" && En.stem("is") == "is" && En.stem("be") == "be")
    // the analyze chain: stopwords removed BEFORE stemming, order preserved
    val toks = Analyzer.analyze("The cats are running quickly into their houses", "english")
    assert(toks.toSeq == Seq("cat", "run", "quickli", "hous"))
    // dl semantics: count after stopword removal
    assert(toks.length == 4)
  }

  test("standard analyzer dispatch unchanged; unknown analyzer rejected") {
    val text = "The cats are running"
    assert(Analyzer.analyze(text, "standard").toSeq == Analyzer.tokenize(text).toSeq)
    assertThrows[IllegalArgumentException](Analyzer.analyze(text, "french"))
  }
}
