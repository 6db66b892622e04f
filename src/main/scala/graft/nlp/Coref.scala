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
   * Annotate antecedents across a document's sentences, two passes
   * (the reference's PostIRAnnotator also sees the whole document before
   * rewriting):
   *
   *  PASS 1 — document-wide mention inventory: every PERSON/ORG NER run.
   *  Representative-mention ladder (PostIRAnnotator.java:584-650): each
   *  surface resolves to the LONGEST document mention it matches —
   *  surname match for bare person tokens (guarded by the common-names
   *  list, :77-93), first-letters acronym for org tokens, strict
   *  approximate-token containment for multi-token partial names; ties
   *  break lexicographically (deterministic).
   *
   *  PASS 2 — left-to-right rewrite: mention runs get the representative
   *  as antecedent (canonical-span rewrite, X8); person/org pronouns and
   *  "the company|firm|…" definites get the most recent mention's
   *  representative. First/second-person pronouns are never resolved
   *  (chain cleaning, :584-650 drops 1st-person chains).
   */
  def resolve(sents: IndexedSeq[(IndexedSeq[String], Array[String])])
      : IndexedSeq[Array[String]] = {
    // ---- pass 1: inventory
    val personPool = scala.collection.mutable.LinkedHashSet[String]()
    val orgPool = scala.collection.mutable.LinkedHashSet[String]()
    for ((words, ner) <- sents) {
      var i = 0
      while (i < words.length) {
        if (ner(i) == NER.PERSON || ner(i) == NER.ORGANIZATION) {
          var j = i
          while (j < words.length && ner(j) == ner(i)) j += 1
          val surface = (i until j).map(words).mkString(" ")
          if (ner(i) == NER.PERSON) personPool += surface else orgPool += surface
          i = j
        } else i += 1
      }
    }
    // longest-then-lexicographic winner (deterministic)
    val repOrd: Ordering[String] = Ordering.by((s: String) => (-s.length, s))
    def containsTokens(small: Seq[String], large: Seq[String]): Boolean =
      small.length < large.length &&
        small.forall(s => large.exists(l => approxTokenMatch(s, l)))
    /** Chain cleaning (PostIRAnnotator.java:584-650): dcoref never chains
     *  a mention into two DIFFERENT entities, so when a surface matches
     *  several pool mentions that are not partial forms of one another
     *  (incomparable chains), it is AMBIGUOUS and stays unresolved — the
     *  old longest-wins pick silently merged distinct entities ("Smith"
     *  with both "John Smith" and "Anna Smith" in the document). */
    def best(cands: Iterable[String]): Option[String] = {
      val cs = cands.toVector.distinct
      if (cs.isEmpty) None
      else {
        val maximal = cs.filterNot(c => cs.exists(o => o != c &&
          containsTokens(c.split(" ").toSeq, o.split(" ").toSeq)))
        if (maximal.length == 1) Some(maximal.head)
        else None // >1 incomparable chains: ambiguous, leave unresolved
      }
    }
    def repPerson(surface: String): Option[String] = {
      val toks = surface.split(" ").toSeq
      if (toks.length == 1) {
        if (Gazetteers.firstNames.contains(surface)) None // common-names guard
        else best(personPool.filter { p =>
          val pt = p.split(" ")
          pt.length > 1 && approxTokenMatch(pt.last, surface)
        })
      } else best(personPool.filter(p =>
        containsTokens(toks, p.split(" ").toSeq)))
    }
    // legal boilerplate a longer form may add to the SAME organization;
    // any other extra token means the container is a different entity
    val legalSuffixes = Set("inc", "inc.", "corp", "corp.", "co", "co.",
      "ltd", "ltd.", "llc", "corporation", "company")
    def repOrg(surface: String): Option[String] = {
      val toks = surface.split(" ").toSeq
      val viaAcronym =
        if (toks.length == 1 && surface.forall(c => !c.isLower))
          best(orgPool.filter(o => isAcronymOf(surface, o.split(" ").toSeq)))
        else None
      // nested-mention cleaning (PostIRAnnotator.java:616-635 keeps the
      // NARROW mention): a surface that already carries its own org head
      // word ("Stanford University", "First National Bank") is a complete
      // name — it only chains into a container whose extra tokens are
      // legal-suffix boilerplate, never into a longer DIFFERENT org
      // ("Stanford University Hospital Group")
      val hasOrgHead = toks.exists(Gazetteers.orgSuffixes.contains)
      viaAcronym.orElse(best(orgPool.filter { o =>
        val oToks = o.split(" ").toSeq
        containsTokens(toks, oToks) && (!hasOrgHead ||
          oToks.filterNot(ot => toks.exists(t => approxTokenMatch(t, ot)))
            .forall(ot => legalSuffixes.contains(ot.toLowerCase)))
      }))
    }

    // ---- pass 2: rewrite
    var lastPerson = ""
    var lastOrg = ""
    var lastLocation = ""
    val locationNers = Set(NER.CITY, NER.STATE_OR_PROVINCE, NER.COUNTRY)
    val out = Array.newBuilder[Array[String]]
    for ((words, ner) <- sents) {
      val ante = Array.fill(words.length)("")
      var i = 0
      while (i < words.length) {
        val w = words(i)
        if (ner(i) == NER.PERSON || ner(i) == NER.ORGANIZATION) {
          var j = i
          while (j < words.length && ner(j) == ner(i)) j += 1
          val surface = (i until j).map(words).mkString(" ")
          val rep = (if (ner(i) == NER.PERSON) repPerson(surface)
                     else repOrg(surface)).getOrElse(surface)
          if (rep != surface) (i until j).foreach(k => ante(k) = rep)
          if (ner(i) == NER.PERSON) lastPerson = rep else lastOrg = rep
          i = j
        } else if (locationNers.contains(ner(i))) {
          // track the most recent location mention: antecedent for the
          // "there"/"here" pro-forms (SlotMentionAnnotator.geography(),
          // process/SlotMentionAnnotator.java:91-119)
          var j = i
          while (j < words.length && ner(j) == ner(i)) j += 1
          lastLocation = (i until j).map(words).mkString(" ")
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
          else if (locationProForms.contains(w) && lastLocation.nonEmpty)
            ante(i) = lastLocation
          i += 1
        }
      }
      out += ante
    }
    out.result().toIndexedSeq
  }

  /** Location pro-forms eligible for the geography() retag. */
  val locationProForms: Set[String] = Set("there", "There", "here", "Here")
}
