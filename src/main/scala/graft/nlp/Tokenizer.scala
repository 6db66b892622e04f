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
  private val Tok = (
    "(?:https?://[^\\s<>\"]+|www\\.[^\\s<>\"]+)" +          // url
    "|(?:\\p{L}\\.){2,}" +                                   // U.S., i.e.
    "|\\p{L}+\\." +                                          // maybe-abbrev.
    "|\\d+(?:-\\p{L}+)+" +                                   // 75-year-old
    "|\\d+(?:[.,]\\d+)*%?" +                                 // 1,234.5 / 42%
    "|\\p{L}+(?:['’\\-]\\p{L}{2,})*" +                       // words, O'Neil
    "|['’]\\p{L}" +                                          // clitics 's 't 'm
    "|\\S"                                                   // any symbol
  ).r

  /** Tokenize with char offsets. A trailing "xyz." token is kept whole only
   *  for known abbreviations; otherwise split into word + ".". */
  def tokenize(text: String): Vector[RawToken] = {
    val out = Vector.newBuilder[RawToken]
    val m = Tok.pattern.matcher(text)
    while (m.find()) {
      var t = m.group()
      var (b, e) = (m.start(), m.end())
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
    out.result()
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
