package graft.nlp

import graft.model.NER

/**
 * Document-scoped lightweight coreference: the literal + acronym + pronoun
 * antecedent ladder of the reference's PostIRAnnotator
 * (ir/PostIRAnnotator.java:237-405 coref chains, :416-511 literal+acronym,
 * :676-684 approximate token match). Full dcoref is out of scope (SURVEY.md
 * §7 M2); the fork itself leans on literal matching.
 *
 * State is confined to one document (one input row), so this runs inside the
 * per-partition annotate loop — no cross-row state, no shuffle.
 */
object Coref {

  /** First-letters acronym test (RuleBasedNameMatcher.isAcronymImpl,
   *  entitylinking/classify/namematcher/RuleBasedNameMatcher.java:500-515). */
  def isAcronymOf(acronym: String, words: Seq[String]): Boolean = {
    val letters = acronym.replace(".", "")
    val content = words.filter(w => w.nonEmpty && w.charAt(0).isUpper)
    letters.length >= 2 && content.length == letters.length &&
      content.zip(letters).forall { case (w, c) =>
        w.charAt(0).toUpper == c.toUpper
      }
  }

  /** Case-insensitive token match with plural-s/es and abbreviation-dot
   *  tolerance (PostIRAnnotator.java:676-684). */
  def approxTokenMatch(a: String, b: String): Boolean = {
    def norm(s: String) = {
      val l = s.toLowerCase.stripSuffix(".")
      if (l.endsWith("es")) l.dropRight(2)
      else if (l.endsWith("s")) l.dropRight(1)
      else l
    }
    a.equalsIgnoreCase(b) || norm(a) == norm(b)
  }

  /**
   * Annotate antecedents in-place across a document's sentences.
   * Inputs are parallel per-sentence arrays (words, ner); outputs an
   * antecedent array per sentence ("" = none).
   *
   * Ladder per token run:
   *  - person pronouns -> most recent PERSON mention surface
   *  - org pronouns ("it/they") + "the company|firm|group|organization|university"
   *    -> most recent ORGANIZATION mention
   *  - all-caps acronym token -> earlier multi-word ORG whose first letters match
   *  - bare surname -> earlier multi-token PERSON ending in that word
   */
  def resolve(sents: IndexedSeq[(IndexedSeq[String], Array[String])])
      : IndexedSeq[Array[String]] = {
    var lastPerson = ""
    var lastOrg = ""
    val seenPersons = scala.collection.mutable.LinkedHashSet[String]()
    val seenOrgs = scala.collection.mutable.LinkedHashSet[String]()
    val out = Array.newBuilder[Array[String]]

    for ((words, ner) <- sents) {
      val ante = Array.fill(words.length)("")
      // collect mentions in order; update last-seen AFTER resolving pronouns
      // in this sentence would lose cataphora; the reference resolves with
      // chains over the whole doc — we resolve left-to-right, updating as
      // mentions appear, which matches typical newswire anaphora.
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (ner(i) == NER.PERSON || ner(i) == NER.ORGANIZATION) {
          var j = i
          while (j < words.length && ner(j) == ner(i)) j += 1
          val surface = (i until j).map(words).mkString(" ")
          if (ner(i) == NER.PERSON) {
            // bare surname -> earlier full name (guarded: not a common first
            // name, mirroring the common_names guard PostIRAnnotator.java:77-93)
            if (j - i == 1 && !Gazetteers.firstNames.contains(w)) {
              seenPersons.find(p => p.split(" ").length > 1 &&
                approxTokenMatch(p.split(" ").last, w)) match {
                case Some(full) => (i until j).foreach(k => ante(k) = full)
                case None =>
              }
            }
            val full = if (ante(i).nonEmpty) ante(i) else surface
            lastPerson = full
            seenPersons += full
          } else {
            // acronym of an earlier multi-word org
            if (j - i == 1 && w.forall(c => !c.isLower)) {
              seenOrgs.find(o => isAcronymOf(w, o.split(" ").toSeq)) match {
                case Some(full) => (i until j).foreach(k => ante(k) = full)
                case None =>
              }
            }
            val full = if (ante(i).nonEmpty) ante(i) else surface
            lastOrg = full
            seenOrgs += full
          }
          i = j
        } else {
          if (Gazetteers.personPronouns.contains(w) && lastPerson.nonEmpty)
            ante(i) = lastPerson
          else if (Gazetteers.orgPronouns.contains(w) && lastOrg.nonEmpty)
            ante(i) = lastOrg
          else if ((w == "company" || w == "firm" || w == "organization" ||
                    w == "group" || w == "university") && i > 0 &&
                   words(i - 1).equalsIgnoreCase("the") && lastOrg.nonEmpty)
            ante(i) = lastOrg
          i += 1
        }
      }
      out += ante
    }
    out.result().toIndexedSeq
  }
}
