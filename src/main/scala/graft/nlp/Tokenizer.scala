package graft.nlp

/**
 * Deterministic PTB-style tokenizer + sentence splitter (pure functions; one
 * instance per partition in the NLP mapPartitions stage).
 *
 * Replaces the reference's `tokenize, ssplit` annotators
 * (common/Props.java:494). Fixed rules, no models, so output is stable across
 * JVMs/partitions — required by the byte-identical invariant and the
 * determinism-under-parallelism risk (SURVEY.md §7).
 */
object Tokenizer {

  final case class RawToken(text: String, begin: Int, end: Int)

  /** Abbreviations that keep a trailing period inside the token and do not
   *  end a sentence. */
  val Abbrevs: Set[String] = Set(
    "Mr", "Mrs", "Ms", "Dr", "Prof", "Rev", "Gen", "Sen", "Rep", "Gov",
    "St", "Jr", "Sr", "Inc", "Corp", "Co", "Ltd", "LLC", "vs", "etc",
    "Jan", "Feb", "Mar", "Apr", "Jun", "Jul", "Aug", "Sep", "Sept", "Oct",
    "Nov", "Dec", "No", "Vol", "Mt", "Ft")

  // Ordered alternation: URL | acronym(U.S.) | abbreviation. | number |
  // word(with internal '/-) | single char. Longest-first within the scan.
  // r6: kept as the DEFINITION the hand-rolled scanner below must equal —
  // TokenizerSpec diffs the two token streams on the generated corpus
  // plus adversarial strings; the scanner exists because Matcher.find
  // over this 8-way alternation was ~316 ns/token of pure per-page CPU
  // (guide §1.2 step 2) and the alternation is simple enough to scan
  // directly (each branch is prefix-decidable at the start position).
  private[graft] val Tok = (
    "(?:https?://[^\\s<>\"]+|www\\.[^\\s<>\"]+)" +          // url
    "|(?:\\p{L}\\.){2,}" +                                   // U.S., i.e.
    "|\\p{L}+\\." +                                          // maybe-abbrev.
    "|\\d+(?:-\\p{L}+)+" +                                   // 75-year-old
    "|\\d+(?:[.,]\\d+)*%?" +                                 // 1,234.5 / 42%
    "|\\p{L}+(?:['’\\-]\\p{L}{2,})*" +                       // words, O'Neil
    "|['’]\\p{L}" +                                          // clitics 's 't 'm
    "|\\S"                                                   // any symbol
  ).r

  /** Java-regex character classes, replicated exactly: default \s is the
   *  6 ASCII whitespace chars (U+00A0 etc. are \S and DO tokenize);
   *  default \d is ASCII 0-9; \p{L} is the Unicode letter category of
   *  the CODE POINT (surrogate pairs count as one letter). */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  @inline private def isAsciiDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** Length in chars of the letter run (code-point aware) at `p`; 0 if
   *  none. */
  private def letterRun(s: String, p: Int): Int = {
    var q = p
    val n = s.length
    while (q < n) {
      val cp = s.codePointAt(q)
      if (Character.isLetter(cp)) q += Character.charCount(cp) else return q - p
    }
    q - p
  }

  /** One token [start, end) beginning at non-\s position `p` — the exact
   *  first-match-wins semantics of the `Tok` alternation. */
  private def tokenEnd(s: String, p: Int): Int = {
    val n = s.length
    val c = s.charAt(p)
    // 1. url: https?:// or www. then [^\s<>"]+
    val urlPrefix =
      if (c == 'h' && s.startsWith("http://", p)) 7
      else if (c == 'h' && s.startsWith("https://", p)) 8
      else if (c == 'w' && s.startsWith("www.", p)) 4
      else 0
    if (urlPrefix > 0) {
      // every prefix char is itself in [^\s<>"], so the candidate match
      // is the maximal class run from p; the regex needs >= 1 char AFTER
      // the literal prefix — a bare "http://" / "www." falls through to
      // the later alternatives exactly as the alternation does
      var q = p
      while (q < n && { val x = s.charAt(q)
        !isWs(x) && x != '<' && x != '>' && x != '"' }) q += 1
      if (q - p > urlPrefix) return q
    }
    val cp0 = s.codePointAt(p)
    if (Character.isLetter(cp0)) {
      // 2. (\p{L}\.){2,} — single letter + dot, >= 2 pairs, greedy
      var q = p
      var pairs = 0
      var continue = true
      while (continue && q < n) {
        val cp = s.codePointAt(q)
        val w = Character.charCount(cp)
        if (Character.isLetter(cp) && q + w < n && s.charAt(q + w) == '.') {
          q += w + 1; pairs += 1
        } else continue = false
      }
      if (pairs >= 2) return q
      // 3. \p{L}+\. — maximal letter run immediately followed by '.'
      val lr = letterRun(s, p)
      if (p + lr < n && s.charAt(p + lr) == '.') return p + lr + 1
      // 6. \p{L}+(?:['’-]\p{L}{2,})* — run, then connector + >=2 letters
      var e = p + lr
      var more = true
      while (more && e < n) {
        val x = s.charAt(e)
        if ((x == '\'' || x == '’' || x == '-') && e + 1 < n) {
          val r2 = letterRun(s, e + 1)
          // {2,} in CHAR terms? \p{L}{2,} counts CODE POINTS; require >=2
          val cps = Character.codePointCount(s, e + 1, e + 1 + r2)
          if (cps >= 2) e = e + 1 + r2 else more = false
        } else more = false
      }
      return e
    }
    if (isAsciiDigit(c)) {
      var d = p
      while (d < n && isAsciiDigit(s.charAt(d))) d += 1
      // 4. \d+(?:-\p{L}+)+ — at least one dash+letters group
      var q = d
      var groups = 0
      var more = true
      while (more && q < n && s.charAt(q) == '-') {
        val lr = letterRun(s, q + 1)
        if (lr > 0) { q = q + 1 + lr; groups += 1 } else more = false
      }
      if (groups >= 1) return q
      // 5. \d+(?:[.,]\d+)*%? — punct groups need a following digit
      q = d
      more = true
      while (more && q + 1 < n && (s.charAt(q) == '.' || s.charAt(q) == ',') &&
             isAsciiDigit(s.charAt(q + 1))) {
        var r = q + 1
        while (r < n && isAsciiDigit(s.charAt(r))) r += 1
        q = r
      }
      if (q < n && s.charAt(q) == '%') q += 1
      return q
    }
    // 7. ['’]\p{L}
    if ((c == '\'' || c == '’') && p + 1 < n &&
        Character.isLetter(s.codePointAt(p + 1)))
      return p + 1 + Character.charCount(s.codePointAt(p + 1))
    // 8. \S — one char (a lone high surrogate is one char too, as in regex)
    p + Character.charCount(cp0).min(n - p)
  }

  /** Tokenize with char offsets. A trailing "xyz." token is kept whole only
   *  for known abbreviations; otherwise split into word + ".".
   *  Scanner form of the `Tok` regex (see its comment); byte-identical
   *  token streams are pinned by TokenizerSpec's differential test. */
  def tokenize(text: String): Vector[RawToken] = {
    val out = Vector.newBuilder[RawToken]
    var p = 0
    val n = text.length
    while (p < n) {
      if (isWs(text.charAt(p))) p += 1
      else {
        val e = tokenEnd(text, p)
        emit(out, text.substring(p, e), p, e)
        p = e
      }
    }
    out.result()
  }

  /** The regex form, kept verbatim for the differential spec. */
  private[graft] def tokenizeRegex(text: String): Vector[RawToken] = {
    val out = Vector.newBuilder[RawToken]
    val m = Tok.pattern.matcher(text)
    while (m.find()) {
      emit(out, m.group(), m.start(), m.end())
    }
    out.result()
  }

  /** Shared post-step: URL punctuation re-split + abbreviation handling. */
  private def emit(out: scala.collection.mutable.Builder[RawToken, Vector[RawToken]],
                   t0: String, b0: Int, e0: Int): Unit = {
      var t = t0
      var (b, e) = (b0, e0)
      // URLs greedily absorb trailing punctuation; split it back off
      if (t.startsWith("http://") || t.startsWith("https://") ||
          t.startsWith("www.")) {
        var cut = t.length
        while (cut > 0 && ".,;:!?)]".indexOf(t.charAt(cut - 1)) >= 0) cut -= 1
        if (cut < t.length) {
          out += RawToken(t.substring(0, cut), b, b + cut)
          var k = cut
          while (k < t.length) {
            out += RawToken(t.substring(k, k + 1), b + k, b + k + 1)
            k += 1
          }
          t = ""
        }
      }
      if (t.isEmpty) {} // already emitted (split URL)
      else if (t.length > 1 && t.endsWith(".") && !t.dropRight(1).contains(".")) {
        val stem = t.dropRight(1)
        if (Abbrevs.contains(stem)) out += RawToken(t, b, e)
        else { out += RawToken(stem, b, e - 1); out += RawToken(".", e - 1, e) }
      } else out += RawToken(t, b, e)
  }

  /** Sentence boundaries over the token stream: split after . ! ? (not
   *  abbreviation-internal) and at newline gaps (paragraph breaks). Returns
   *  token index ranges [from, until). */
  def sentenceSpans(text: String, toks: Vector[RawToken]): Vector[(Int, Int)] = {
    val out = Vector.newBuilder[(Int, Int)]
    var start = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val isEnd = t.text == "." || t.text == "!" || t.text == "?"
      val parBreak = i + 1 < toks.length &&
        text.substring(t.end, toks(i + 1).begin).contains('\n')
      if (isEnd || parBreak || i == toks.length - 1) {
        // absorb closing quotes/parens after the terminal
        var j = i
        while (!parBreak && j + 1 < toks.length &&
               (toks(j + 1).text == "\"" || toks(j + 1).text == ")" ||
                toks(j + 1).text == "'" || toks(j + 1).text == "’") &&
               !text.substring(toks(j).end, toks(j + 1).begin).contains('\n'))
          j += 1
        out += ((start, j + 1))
        start = j + 1
        i = j
      }
      i += 1
    }
    out.result().filter { case (a, b) => b > a }
  }
}
