package graft.core

/** English analysis chain — the ES `english` analyzer's two load-bearing
  * filters, implemented from the public definitions:
  *
  *  - stopword removal: Lucene's `EnglishAnalyzer.ENGLISH_STOP_WORDS_SET`
  *    (the classic 33-word list, unchanged since Lucene 1.x);
  *  - stemming: the original Porter algorithm (M.F. Porter, "An algorithm
  *    for suffix stripping", Program 14(3), 1980) — steps 1a–5b with the
  *    m-measure consonant/vowel sequence model, exactly as published.
  *    (ES's `english` stemmer is Porter2/Snowball; classic Porter is its
  *    published ancestor and the variant spelled out in the paper, so the
  *    implementation can be verified line-by-line against public test
  *    vectors. The difference is a handful of suffix rules.)
  *
  * Determinism: pure character functions, no locale dependence (input is
  * already lowercased by [[Analyzer.tokenize]]).
  */
object En {

  /** Lucene's classic English stopword list. */
  val Stopwords: Set[String] = Set(
    "a", "an", "and", "are", "as", "at", "be", "but", "by",
    "for", "if", "in", "into", "is", "it",
    "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with")

  /** Full chain over an already-tokenized stream: drop stopwords, stem the
    * rest. Token COUNT changes only via stopword removal — dl semantics for
    * english-analyzed indexes are "post-filter token count", matching what
    * the index stores per posting.
    */
  def analyze(tokens: Array[String]): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](tokens.length)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      if (!Stopwords.contains(t)) out += stem(t)
      i += 1
    }
    out.toArray
  }

  // ---- Porter stemmer ------------------------------------------------------
  // Working representation: a char array slice b[0..k]. Helper predicates
  // follow the paper's notation: cons(i), m() (measure), vowelInStem,
  // doubleC, cvc.

  private def isCons(b: Array[Char], i: Int): Boolean = b(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(b, i - 1)
    case _ => true
  }

  /** m() = number of VC sequences in b[0..j] (the paper's measure). */
  private def measure(b: Array[Char], j: Int): Int = {
    var n = 0
    var i = 0
    // skip initial consonants
    while (i <= j && isCons(b, i)) i += 1
    while (i <= j) {
      // in a vowel run
      while (i <= j && !isCons(b, i)) i += 1
      if (i > j) return n
      n += 1
      while (i <= j && isCons(b, i)) i += 1
    }
    n
  }

  private def vowelInStem(b: Array[Char], j: Int): Boolean = {
    var i = 0
    while (i <= j) { if (!isCons(b, i)) return true; i += 1 }
    false
  }

  /** b[i-1..i] is a double consonant. */
  private def doubleC(b: Array[Char], i: Int): Boolean =
    i >= 1 && b(i) == b(i - 1) && isCons(b, i)

  /** b[i-2..i] is consonant-vowel-consonant, and the final consonant is not
    * w, x or y (the paper's *o condition).
    */
  private def cvc(b: Array[Char], i: Int): Boolean = {
    if (i < 2 || !isCons(b, i) || isCons(b, i - 1) || !isCons(b, i - 2)) false
    else b(i) != 'w' && b(i) != 'x' && b(i) != 'y'
  }

  /** The classic Porter stemmer. Words of length ≤ 2 are returned as-is
    * (the paper's convention).
    */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    val b = word.toCharArray
    var k = b.length - 1 // index of last char of current stem

    def endsWith(s: String): Boolean = {
      val l = s.length
      if (l > k + 1) return false
      var i = 0
      while (i < l) {
        if (b(k - l + 1 + i) != s.charAt(i)) return false
        i += 1
      }
      true
    }
    /** stem part preceding a matched suffix `s`: last index j. */
    def stemEnd(s: String): Int = k - s.length
    def setTo(j: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { b(j + 1 + i) = s.charAt(i); i += 1 }
      k = j + s.length
    }
    /** If suffix matches and m(stem) > 0, replace it. */
    def r(suffix: String, repl: String, minM: Int = 0): Boolean = {
      if (endsWith(suffix)) {
        val j = stemEnd(suffix)
        if (measure(b, j) > minM) setTo(j, repl)
        true // suffix matched (rule consumed), even if condition failed
      } else false
    }

    // ---- step 1a: plurals --------------------------------------------------
    if (endsWith("sses")) k -= 2
    else if (endsWith("ies")) setTo(stemEnd("ies"), "i")
    else if (k >= 1 && b(k) == 's' && b(k - 1) != 's') k -= 1

    // ---- step 1b: -ed / -ing ----------------------------------------------
    var step1bCleanup = false
    if (endsWith("eed")) {
      if (measure(b, stemEnd("eed")) > 0) k -= 1
    } else if (endsWith("ed")) {
      if (vowelInStem(b, stemEnd("ed"))) { k = stemEnd("ed"); step1bCleanup = true }
    } else if (endsWith("ing")) {
      if (vowelInStem(b, stemEnd("ing"))) { k = stemEnd("ing"); step1bCleanup = true }
    }
    if (step1bCleanup) {
      if (endsWith("at") || endsWith("bl") || endsWith("iz")) setTo(k, "e")
      else if (doubleC(b, k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1
      else if (measure(b, k) == 1 && cvc(b, k)) setTo(k, "e")
    }

    // ---- step 1c: y → i ----------------------------------------------------
    if (b(k) == 'y' && vowelInStem(b, k - 1)) b(k) = 'i'

    // ---- step 2: double suffixes (condition m > 0) ------------------------
    if (k > 0) (b(k - 1): @annotation.switch) match {
      case 'a' => val _ = r("ational", "ate") || r("tional", "tion")
      case 'c' => val _ = r("enci", "ence") || r("anci", "ance")
      case 'e' => val _ = r("izer", "ize")
      case 'l' => val _ = r("abli", "able") || r("alli", "al") ||
        r("entli", "ent") || r("eli", "e") || r("ousli", "ous")
      case 'o' => val _ = r("ization", "ize") || r("ation", "ate") || r("ator", "ate")
      case 's' => val _ = r("alism", "al") || r("iveness", "ive") ||
        r("fulness", "ful") || r("ousness", "ous")
      case 't' => val _ = r("aliti", "al") || r("iviti", "ive") || r("biliti", "ble")
      case _ =>
    }

    // ---- step 3 ------------------------------------------------------------
    (b(k): @annotation.switch) match {
      case 'e' => val _ = r("icate", "ic") || r("ative", "") || r("alize", "al")
      case 'i' => val _ = r("iciti", "ic")
      case 'l' => val _ = r("ical", "ic") || r("ful", "")
      case 's' => val _ = r("ness", "")
      case _ =>
    }

    // ---- step 4: strip suffix when m(stem) > 1 -----------------------------
    if (k > 0) {
      val matched = (b(k - 1): @annotation.switch) match {
        case 'a' => if (endsWith("al")) Some("al") else None
        case 'c' => if (endsWith("ance")) Some("ance")
          else if (endsWith("ence")) Some("ence") else None
        case 'e' => if (endsWith("er")) Some("er") else None
        case 'i' => if (endsWith("ic")) Some("ic") else None
        case 'l' => if (endsWith("able")) Some("able")
          else if (endsWith("ible")) Some("ible") else None
        case 'n' => if (endsWith("ant")) Some("ant")
          else if (endsWith("ement")) Some("ement")
          else if (endsWith("ment")) Some("ment")
          else if (endsWith("ent")) Some("ent") else None
        case 'o' =>
          // -ion only strips after s or t (the paper's (s|t)ion condition)
          if (endsWith("ion") && stemEnd("ion") >= 0 &&
              (b(stemEnd("ion")) == 's' || b(stemEnd("ion")) == 't')) Some("ion")
          else if (endsWith("ou")) Some("ou") else None
        case 's' => if (endsWith("ism")) Some("ism") else None
        case 't' => if (endsWith("ate")) Some("ate")
          else if (endsWith("iti")) Some("iti") else None
        case 'u' => if (endsWith("ous")) Some("ous") else None
        case 'v' => if (endsWith("ive")) Some("ive") else None
        case 'z' => if (endsWith("ize")) Some("ize") else None
        case _ => None
      }
      matched.foreach { s =>
        val j = stemEnd(s)
        if (measure(b, j) > 1) k = j
      }
    }

    // ---- step 5a: remove trailing e ---------------------------------------
    if (b(k) == 'e') {
      val m = measure(b, k - 1)
      if (m > 1 || (m == 1 && !cvc(b, k - 1))) k -= 1
    }
    // ---- step 5b: -ll → -l when m > 1 -------------------------------------
    if (b(k) == 'l' && doubleC(b, k) && measure(b, k - 1) > 1) k -= 1

    new String(b, 0, k + 1)
  }
}
