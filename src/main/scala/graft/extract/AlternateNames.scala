package graft.extract

import graft.model.{NER, Provenance, Sentence, SlotFill}

/**
 * B2: the span-walking AlternateNamesExtractor
 * (evaluate/AlternateNamesExtractor.java:23-159).
 *
 * Coref path (extractSlotsViaCoref, :78-115): a maximal run of same-NE
 * tokens whose ANTECEDENT is an entity's representative name, with a
 * surface that is neither the name itself nor a string prefix/suffix of
 * it, is an alternate-name mention of that entity. Mentions are counted
 * per distinct value; only values above `fraction` of the entity's total
 * mention count survive (the reference's frequency gate). Span rules from
 * the annotation path (:119-145): <= 10 tokens, no duplicated noun token,
 * every token the entity's NE type. ORG values whose EXTRA words (those
 * not in the entity name) include of/in or a gazetteer-valid
 * region/country are emitted as org:subsidiaries instead ("Acme of
 * Canada" is a unit, not a nickname — :132-140).
 *
 * OFF by default, exactly like the reference
 * (Props.TEST_RULES_ALTERNATENAMES_DO/_COREF default false,
 * Props.java:313-317): callers union the result into the fill stream
 * before bag aggregation when the mode is wanted. Pure per-document
 * function — runs inside the same narrow stage as candidate generation;
 * no shuffle.
 */
object AlternateNames {

  val Fraction = 0.05 // Props.TEST_RULES_ALTERNATENAMES_FRACTION
  val MaxSpanTokens = 10

  private def sufficientlyDifferent(value: String, entity: String): Boolean =
    !(value.equalsIgnoreCase(entity) || entity.startsWith(value) ||
      entity.endsWith(value))

  private def spanOk(words: Seq[String], poss: Seq[String]): Boolean = {
    if (words.length > MaxSpanTokens) return false
    val seen = scala.collection.mutable.HashSet[String]()
    words.zip(poss).forall { case (w, p) => !p.startsWith("N") || seen.add(w) }
  }

  /** Subsidiary detection (:132-140): the value's EXTRA words (not in the
   *  entity name) include of/in or a gazetteer region/country — "Acme of
   *  Canada" is a unit, not a nickname. Public: our coref ladder resolves
   *  shorter forms to maximal representatives, so this branch fires rarely
   *  through `extract` and is gated directly by spec. */
  def isSubsidiary(valueWords: Seq[String], entity: String): Boolean = {
    val entLc = entity.toLowerCase
    val geo = graft.consistency.WorldKnowledge.default
    valueWords.iterator.map(_.toLowerCase).filterNot(entLc.contains).exists {
      w => w == "of" || w == "in" || geo.isValidRegion(w) || geo.isValidCountry(w)
    }
  }

  /** Alternate-name (and subsidiary) fills for every coref-resolved entity
   *  in one document's sentences. */
  def extract(sents: Seq[Sentence],
              fraction: Double = Fraction): Seq[SlotFill] = {
    // (entity, value) -> (count, first provenance); plus per-entity totals
    val counts = scala.collection.mutable.LinkedHashMap[
      (String, String, String), (Int, Provenance)]()
    val totals = scala.collection.mutable.HashMap[String, Int]()
    for (s <- sents) {
      val toks = s.tokens.toIndexedSeq
      val seenInSentence = scala.collection.mutable.HashSet[(String, String)]()
      var i = 0
      while (i < toks.length) {
        val t = toks(i)
        if (t.ner == NER.PERSON || t.ner == NER.ORGANIZATION) {
          var j = i
          while (j < toks.length && toks(j).ner == t.ner &&
                 toks(j).antecedent == t.antecedent) j += 1
          val words = (i until j).map(toks(_).word)
          val value = words.mkString(" ")
          if (t.antecedent.isEmpty) {
            // literal mention of a representative: counts toward the
            // entity's total (the reference's literalMentionsCount)
            totals(value) = totals.getOrElse(value, 0) + 1
          } else {
            val entity = t.antecedent
            totals(entity) = totals.getOrElse(entity, 0) + 1
            if (sufficientlyDifferent(value, entity) &&
                spanOk(words, (i until j).map(toks(_).pos))) {
              val key = (entity, t.ner, value)
              val inc = if (seenInSentence.add((entity, value))) 1 else 0
              counts.get(key) match {
                case Some((c, p)) => counts(key) = (c + inc, p)
                case None => counts(key) =
                  (inc, Provenance(s.doc_id, s.url, s.sent_idx, i, j, i, j))
              }
            }
          }
          i = j
        } else i += 1
      }
    }
    counts.iterator.collect {
      case ((entity, tpe, value), (c, prov))
        if c.toDouble > totals.getOrElse(entity, 0).toDouble * fraction =>
        val pred =
          if (tpe == NER.ORGANIZATION &&
              isSubsidiary(value.split(" ").toSeq, entity)) "org:subsidiaries"
          else if (tpe == NER.PERSON) "per:alternate_names"
          else "org:alternate_names"
        SlotFill(entity, tpe, pred, value, tpe, 1.0, prov)
    }.toSeq
  }
}
