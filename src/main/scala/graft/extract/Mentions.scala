package graft.extract

import graft.model.{NER, Sentence, Mention}
import graft.nlp.Gazetteers

/**
 * Entity- and slot-mention extraction over an annotated sentence.
 *
 * Combines the reference's EntityMentionAnnotator
 * (process/EntityMentionAnnotator.java:49-130) in ALL_PAIRS mode — entity
 * mentions are all PER/ORG NER runs — and SlotMentionAnnotator
 * (process/SlotMentionAnnotator.java:75-165): pronoun retagging via
 * antecedent, maximal same-NER runs not overlapping entity spans, trailing
 * IN/DT/RB/EX/POS trim, `closeEnough` distance gate of 25 tokens
 * (common/Utils.java:303-315, Props.java:497-498).
 */
object Mentions {

  val MaxEntitySlotDistance = 25 // MAX_DISTANCE_BETWEEN_ENTITY_AND_SLOT
  private val TrimPos = Set("IN", "DT", "RB", "EX", "POS", "CC")

  final case class Spans(entities: Seq[Mention], slots: Seq[Mention])

  def extract(s: Sentence): Spans = {
    val toks = s.tokens.toIndexedSeq
    val n = toks.length

    // ---- entity mentions: maximal PERSON/ORGANIZATION runs
    val entities = Seq.newBuilder[Mention]
    var i = 0
    while (i < n) {
      val t = toks(i).ner
      if (NER.isEntityType(t)) {
        var j = i
        while (j < n && toks(j).ner == t) j += 1
        val surface = (i until j).map(toks(_).word).mkString(" ")
        val norm = if (toks(i).antecedent.nonEmpty) toks(i).antecedent else surface
        entities += Mention(s.url, s.doc_id, s.sent_idx, "entity", i, j, t,
          surface, norm)
        i = j
      } else i += 1
    }
    // coref mentions as entities (EntityMentionAnnotator.java:49-130: runs
    // of AntecedentAnnotation not overlapping literal matches): a pronoun or
    // "the company"-style token with a resolved antecedent acts as an entity
    // mention normalized to the antecedent.
    i = 0
    while (i < n) {
      val t = toks(i)
      if (t.ner == "O" && t.antecedent.nonEmpty &&
          !graft.nlp.Coref.locationProForms.contains(t.word)) {
        val tpe =
          if (Gazetteers.personPronouns.contains(t.word)) NER.PERSON
          else NER.ORGANIZATION
        entities += Mention(s.url, s.doc_id, s.sent_idx, "entity", i, i + 1,
          tpe, t.word, t.antecedent)
      }
      i += 1
    }
    val ents = entities.result()
    val entSpans = ents.map(m => (m.b, m.e))
    def overlapsEntity(b: Int, e: Int) =
      entSpans.exists { case (eb, ee) => b < ee && eb < e }
    def closeEnough(b: Int, e: Int) = entSpans.exists { case (eb, ee) =>
      math.min(math.abs(eb - e), math.abs(b - ee)) <= MaxEntitySlotDistance ||
        (b < ee && eb < e)
    }

    // ---- slot mentions
    val slots = Seq.newBuilder[Mention]

    // pronoun retag (SlotMentionAnnotator.java:91-119): PRP with person
    // antecedent acts as a PERSON slot candidate normalized to the
    // antecedent; the geography() half retags a location pro-form whose
    // antecedent is a gazetteer-valid city/region/country as a slot of
    // that type ("lives there" -> CITY "Paris")
    i = 0
    while (i < n) {
      val t = toks(i)
      if (t.pos == "PRP" && t.antecedent.nonEmpty &&
          Gazetteers.personPronouns.contains(t.word) &&
          !overlapsEntity(i, i + 1) && closeEnough(i, i + 1)) {
        slots += Mention(s.url, s.doc_id, s.sent_idx, "slot", i, i + 1,
          NER.PERSON, t.word, t.antecedent)
      } else if (t.antecedent.nonEmpty &&
          graft.nlp.Coref.locationProForms.contains(t.word) &&
          !overlapsEntity(i, i + 1) && closeEnough(i, i + 1)) {
        val geo = graft.consistency.WorldKnowledge.default
        val tpe =
          if (geo.isValidCity(t.antecedent)) NER.CITY
          else if (geo.isValidRegion(t.antecedent)) NER.STATE_OR_PROVINCE
          else if (geo.isValidCountry(t.antecedent)) NER.COUNTRY
          else ""
        if (tpe.nonEmpty)
          slots += Mention(s.url, s.doc_id, s.sent_idx, "slot", i, i + 1,
            tpe, t.word, t.antecedent)
      }
      i += 1
    }

    // A4 MODIFIER pass (SlotMentionAnnotator.java:172-243,
    // findConditionalNamedEntities/findModifiers): inside the NP that
    // contains an entity mention, the run of common-noun (NN*, NER=O)
    // tokens before the mention start is retagged MODIFIER and becomes a
    // slot candidate — "cofounder Jane Roe" yields MODIFIER "cofounder"
    // even when the noun is in no title gazetteer. The reference walks
    // the parse tree for the NP; with no parser in-sandbox the NP is the
    // containing noun-run chunk (the X9 approximation). The ontology
    // already admits MODIFIER for per:title (RelationType.java:42), so
    // the candidate flows to the classifiers unchanged.
    for (m <- ents) {
      var npb = m.b
      while (npb > 0 && {
        val p = toks(npb - 1).pos
        p == "DT" || p.startsWith("JJ") || p.startsWith("NN")
      }) npb -= 1
      var mb = -1
      var me = -1
      var k = npb
      while (k < m.b && me == -1) {
        val t = toks(k)
        if (mb == -1 && t.pos.startsWith("NN") && t.ner == "O") mb = k
        else if (mb >= 0 && (!t.pos.startsWith("NN") || t.ner != "O")) me = k
        k += 1
      }
      if (mb >= 0) {
        if (me == -1) me = m.b
        if (me > mb && !overlapsEntity(mb, me)) {
          val surface = (mb until me).map(toks(_).word).mkString(" ")
          slots += Mention(s.url, s.doc_id, s.sent_idx, "slot", mb, me,
            NER.MODIFIER, surface, surface)
        }
      }
    }

    // maximal same-NER runs (all known tags), not overlapping entity spans
    i = 0
    while (i < n) {
      val tag = toks(i).ner
      if (tag != "O") {
        var j = i
        while (j < n && toks(j).ner == tag) j += 1
        // trim trailing function words (SlotMentionAnnotator trim rule)
        var e = j
        while (e > i && TrimPos.contains(toks(e - 1).pos)) e -= 1
        // X9 ExpandToMaximalPhraseRewrite
        // (HeuristicSlotfillPostProcessors.java:370-422): a TITLE fill
        // absorbs the preceding common-noun run (tag n*, not NNP, no NE),
        // then refuses to start on a conjunction — "software engineer",
        // not "engineer". Applied at mention time where the tokens are in
        // hand (the reference rewrites post-hoc through provenance).
        var b = i
        if (tag == NER.TITLE) {
          while (b > 0 && toks(b - 1).pos == "NN" && toks(b - 1).ner == "O")
            b -= 1
          while (b < i && toks(b).pos == "CC") b += 1
        }
        if (e > b && !overlapsEntity(b, e) && closeEnough(b, e)) {
          val surface = (b until e).map(toks(_).word).mkString(" ")
          val norm = normalize(tag, surface, toks(b).antecedent, toks(b).timex)
          slots += Mention(s.url, s.doc_id, s.sent_idx, "slot", b, e, tag,
            surface, norm)
        }
        i = j
      } else i += 1
    }
    Spans(ents, slots.result())
  }

  /** Canonical-mention normalization carried as a column (X8 semantics,
   *  HeuristicSlotfillPostProcessors.java:298-367): DATE -> TIMEX value,
   *  PERSON -> (longer) antecedent, NUMBER -> digit run. */
  def normalize(ner: String, surface: String, antecedent: String,
                timex: String): String = ner match {
    case NER.DATE if timex.nonEmpty => timex
    case NER.PERSON if antecedent.length >= surface.length &&
      antecedent.nonEmpty => antecedent
    case NER.NUMBER =>
      val digits = surface.takeWhile(c => c.isDigit || c == ',' || c == '.')
      if (digits.nonEmpty) digits.replace(",", "") else surface
    case NER.DURATION =>
      val digits = surface.takeWhile(_.isDigit)
      if (digits.nonEmpty) digits else surface
    case _ => surface
  }
}
