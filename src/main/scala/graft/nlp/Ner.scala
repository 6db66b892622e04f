package graft.nlp

import graft.model.NER

/**
 * Deterministic gazetteer + regex NER with TIMEX date normalization.
 *
 * Stand-in for the reference's `ner, regexner` annotators plus SUTime
 * (common/Props.java:494; regexner mapping file
 * resources/.../kbp_regexner_mapping.tab). Pure function of the token
 * sequence — no models, so partition-order independent.
 *
 * Priority (longest match first, then this order): explicit gazetteers
 * (geo/nationality/religion/ideology/charge/cause/title) > dates >
 * person (first-name anchored) > organization (suffix anchored) >
 * acronym > number/url.
 */
object Ner {

  final case class Tagged(ner: Array[String], timex: Array[String])

  // first-word(lowercased) -> entries (words, tag, caseSensitive)
  private case class Entry(words: Array[String], tag: String, cs: Boolean)
  private val lexicon: Map[String, Seq[Entry]] = {
    def entries(names: Iterable[String], tag: String, cs: Boolean) =
      names.map(n => Entry(n.split(" "), tag, cs))
    val all =
      entries(Gazetteers.cities.keys, NER.CITY, cs = true) ++
      entries(Gazetteers.states, NER.STATE_OR_PROVINCE, cs = true) ++
      entries(Gazetteers.countries, NER.COUNTRY, cs = true) ++
      entries(Seq("U.S.", "USA", "U.K.", "UK"), NER.COUNTRY, cs = true) ++
      entries(Gazetteers.nationalities.keys, NER.NATIONALITY, cs = true) ++
      entries(Gazetteers.religions, NER.RELIGION, cs = true) ++
      entries(Gazetteers.ideologies, NER.IDEOLOGY, cs = false) ++
      entries(Gazetteers.criminalCharges, NER.CRIMINAL_CHARGE, cs = false) ++
      entries(Gazetteers.causesOfDeath, NER.CAUSE_OF_DEATH, cs = false) ++
      entries(Gazetteers.titles, NER.TITLE, cs = false)
    all.toSeq.groupBy(_.words(0).toLowerCase)
      // longest match first; deterministic tiebreak by tag then surface
      .map { case (k, v) =>
        k -> v.sortBy(e => (-e.words.length, e.tag, e.words.mkString(" ")))
      }
  }

  private val Year = "^(1[0-9]{3}|20[0-9]{2}|21[0-9]{2})$".r
  private def isYear(s: String) = Year.pattern.matcher(s).matches()
  private def isDay(s: String) =
    s.nonEmpty && s.length <= 2 && s.forall(_.isDigit) &&
      { val d = s.toInt; d >= 1 && d <= 31 }
  private def month(s: String): Option[String] =
    Gazetteers.months.get(s.toLowerCase.stripSuffix("."))

  private def isCapWord(w: String): Boolean =
    w.nonEmpty && w.charAt(0).isUpper && w.exists(_.isLetter)
  // precompiled: String.matches compiles its Pattern on EVERY call and
  // these run per token — visible in executor stack samples
  private val DottedAcronym = java.util.regex.Pattern.compile("(?:\\p{Lu}\\.){2,}")
  private val YearOld = java.util.regex.Pattern.compile("\\d+-year-old")
  private val PlainNumber = java.util.regex.Pattern.compile("\\d+(?:[.,]\\d+)*%?")
  private def isAcronym(w: String): Boolean =
    (w.length >= 2 && w.length <= 6 && w.forall(c => c.isUpper || c.isDigit) &&
      w.exists(_.isUpper)) ||
      (w.length >= 4 && DottedAcronym.matcher(w).matches())

  /** Tag one sentence's tokens. Returns parallel ner/timex arrays. */
  def tag(words: IndexedSeq[String]): Tagged = {
    val n = words.length
    val ner = Array.fill(n)("O")
    val timex = Array.fill(n)("")

    def free(b: Int, e: Int) = (b until e).forall(ner(_) == "O")
    def set(b: Int, e: Int, tag: String, tx: String = ""): Unit = {
      var i = b
      while (i < e) { ner(i) = tag; if (tx.nonEmpty) timex(i) = tx; i += 1 }
    }

    // 1. gazetteer longest-match scan
    var i = 0
    while (i < n) {
      if (ner(i) == "O") {
        lexicon.get(words(i).toLowerCase) match {
          case Some(cands) =>
            val hit = cands.find { e =>
              e.words.length <= n - i && free(i, i + e.words.length) &&
                (0 until e.words.length).forall { j =>
                  val w = words(i + j)
                  if (e.cs) w == e.words(j)
                  else w.equalsIgnoreCase(e.words(j))
                }
            }
            hit match {
              case Some(e) => set(i, i + e.words.length, e.tag); i += e.words.length
              case None => i += 1
            }
          case None => i += 1
        }
      } else i += 1
    }

    // 2. dates (Month D, Y | D Month Y | Month Y | Month D | Y)
    i = 0
    while (i < n) {
      if (ner(i) == "O") month(words(i)) match {
        case Some(mm) =>
          // Month D , Y   /  Month D Y
          if (i + 1 < n && isDay(words(i + 1))) {
            val dd = f"${words(i + 1).toInt}%02d"
            val (yIdx, comma) =
              if (i + 3 < n && words(i + 2) == "," && isYear(words(i + 3))) (i + 3, true)
              else if (i + 2 < n && isYear(words(i + 2))) (i + 2, false)
              else (-1, false)
            if (yIdx > 0) {
              set(i, yIdx + 1, NER.DATE, s"${words(yIdx)}-$mm-$dd")
              if (comma) { ner(i + 2) = NER.DATE; timex(i + 2) = timex(i) }
              i = yIdx + 1
            } else { set(i, i + 2, NER.DATE, s"XXXX-$mm-$dd"); i += 2 }
          } else if (i + 1 < n && isYear(words(i + 1))) {
            set(i, i + 2, NER.DATE, s"${words(i + 1)}-$mm-XX"); i += 2
          } else i += 1
        case None =>
          // D Month Y
          if (isDay(words(i)) && i + 2 < n && month(words(i + 1)).isDefined &&
              isYear(words(i + 2))) {
            val mm = month(words(i + 1)).get
            set(i, i + 3, NER.DATE, s"${words(i + 2)}-$mm-${f"${words(i).toInt}%02d"}")
            i += 3
          } else if (isYear(words(i))) {
            set(i, i + 1, NER.DATE, s"${words(i)}-XX-XX"); i += 1
          } else i += 1
      } else i += 1
    }

    // 3. person runs anchored on a known first name or honorific
    val honorifics = Set("Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "Sen.",
      "Rep.", "Gov.", "Gen.", "Rev.")
    i = 0
    while (i < n) {
      if (ner(i) == "O") {
        val anchor = Gazetteers.firstNames.contains(words(i))
        val honor = honorifics.contains(words(i))
        if (anchor || honor) {
          val start = if (honor) i + 1 else i
          var end = start
          while (end < n && end - start < 3 && ner(end) == "O" &&
                 isCapWord(words(end)) && !isAcronym(words(end)) &&
                 !honorifics.contains(words(end))) end += 1
          // a bare honorific or a first name alone still counts as PERSON
          if (end > start || anchor) {
            val e2 = math.max(end, if (anchor) i + 1 else end)
            if (e2 > start) { set(start, e2, NER.PERSON); i = e2 }
            else i += 1
          } else i += 1
        } else i += 1
      } else i += 1
    }

    // 4. organization runs: capitalized run whose last word is an org suffix
    i = 0
    while (i < n) {
      if (ner(i) == "O" && isCapWord(words(i))) {
        var end = i
        while (end < n && ner(end) == "O" &&
               (isCapWord(words(end)) || isAcronym(words(end)) ||
                 // lowercase legal suffixes ("plc") extend the run too
                 (end > i && Gazetteers.orgSuffixes.contains(words(end))) ||
                 (end > i && (words(end) == "of" || words(end) == "&") &&
                   end + 1 < n && ner(end + 1) == "O" && isCapWord(words(end + 1)))))
          end += 1
        val run = (i until end).map(words)
        val lastSuffix = run.lastIndexWhere(w => Gazetteers.orgSuffixes.contains(w))
        if (lastSuffix > 0) { set(i, i + lastSuffix + 1, NER.ORGANIZATION); i += lastSuffix + 1 }
        else i = math.max(end, i + 1)
      } else i += 1
    }

    // 5. standalone acronyms -> ORGANIZATION
    i = 0
    while (i < n) {
      if (ner(i) == "O" && isAcronym(words(i)) && words(i) != "I")
        ner(i) = NER.ORGANIZATION
      i += 1
    }

    // 6. urls, durations, plain numbers
    i = 0
    while (i < n) {
      if (ner(i) == "O") {
        val w = words(i)
        if (w.startsWith("http://") || w.startsWith("https://") ||
            w.startsWith("www.")) ner(i) = NER.URL
        else if (w.endsWith("-year-old") && YearOld.matcher(w).matches())
          ner(i) = NER.DURATION
        else if (w.nonEmpty && w.charAt(0).isDigit &&
                 PlainNumber.matcher(w).matches()) ner(i) = NER.NUMBER
      }
      i += 1
    }

    Tagged(ner, timex)
  }
}
