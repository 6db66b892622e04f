package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nlp.Annotator
import graft.extract.{Candidates, Mentions, Patterns, Scorer}
import graft.model.NER

class ExtractSpec extends AnyFunSuite {

  private def sentencesOf(text: String) =
    Annotator.annotateText("https://t.example/x", text)

  test("mentions: entity runs, slot runs, closeEnough gate") {
    val s = sentencesOf("John Smith was born in Paris on March 3, 1980.").head
    val Mentions.Spans(ents, slots) = Mentions.extract(s)
    assert(ents.exists(m => m.surface == "John Smith" && m.ner == NER.PERSON))
    assert(slots.exists(m => m.ner == NER.CITY && m.surface == "Paris"))
    assert(slots.exists(m => m.ner == NER.DATE && m.normalized == "1980-03-03"))
  }

  test("candidates: per-sentence dedup on (entity, slotValue) + distance") {
    val s = sentencesOf("John Smith met Paris. Paris again.").head
    val cands = Candidates.fromSentence(s)
    assert(cands.count(c => c.subj == "John Smith" && c.obj == "Paris") <= 1)
  }

  test("patterns: direction sensitivity for parents/children") {
    // "X is the son of Y": X(ent) before phrase -> per:parents
    val between = "is the son of".split(" ")
    val fwd = Patterns.matchRelations(NER.PERSON, NER.PERSON,
      entFirst = true, between)
    assert(fwd.contains("per:parents") && !fwd.contains("per:children"))
    val rev = Patterns.matchRelations(NER.PERSON, NER.PERSON,
      entFirst = false, between)
    assert(rev.contains("per:children") && !rev.contains("per:parents"))
  }

  test("patterns: objType routing for born in city vs state vs country") {
    val between = "was born in".split(" ")
    def m(t: String) = Patterns.matchRelations(NER.PERSON, t, entFirst = true, between)
    assert(m(NER.CITY) == Seq("per:city_of_birth"))
    assert(m(NER.STATE_OR_PROVINCE) == Seq("per:stateorprovince_of_birth"))
    assert(m(NER.COUNTRY) == Seq("per:country_of_birth"))
  }

  test("patterns: end anchoring blocks cross-object firing") {
    // "graduated from A and joined B": for the pair (per, B) the between
    // window ends with "joined" -> schools must NOT fire, employee must
    val between = "graduated from Acme Corp and joined".split(" ")
    val rels = Patterns.matchRelations(NER.PERSON, NER.ORGANIZATION,
      entFirst = true, between)
    assert(rels.contains("per:employee_of"))
    assert(!rels.contains("per:schools_attended"))
  }

  test("scorer: rule hits score 1.0; LR respects primary type") {
    val s = sentencesOf("Emma Wilson was born in Texas.").head
    val fills = Candidates.fromSentence(s).flatMap(Scorer.toFills)
    // Texas is STATE: only stateorprovince_of_birth, never city_of_birth
    assert(fills.exists(f => f.pred == "per:stateorprovince_of_birth" && f.score == 1.0))
    assert(!fills.exists(_.pred == "per:city_of_birth"))
  }

  test("scorer: sigmoid and threshold math") {
    assert(math.abs(Scorer.sigmoid(0.0) - 0.5) < 1e-12)
    assert(Scorer.sigmoid(10) > 0.999)
  }
}
