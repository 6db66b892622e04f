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

  private def cand(between: String, subj: String = "Acme Corp",
                   subjType: String = NER.ORGANIZATION,
                   obj: String = "John Smith",
                   objType: String = NER.PERSON) =
    graft.model.Candidate(subj, subjType, obj, obj, objType,
      "u", "d", 0, 0, 1, 5, 6, Nil, between.split(" ").toSeq.filter(_.nonEmpty))

  test("X10 TopEmployeeRewrite: founded-word between rewrites to founded_by") {
    val c = cand("appointed founder")
    val out = Scorer.betweenPass(c, Seq("org:top_members/employees" -> 0.9))
    assert(out == Seq("org:founded_by" -> 0.9))
    // no founder word -> unchanged
    val keep = Scorer.betweenPass(cand("appointed"),
      Seq("org:top_members/employees" -> 0.9))
    assert(keep == Seq("org:top_members/employees" -> 0.9))
  }

  test("X5 stop-sets: invalid top-employee / org-alt-name justifications") {
    val spokesman = Scorer.betweenPass(cand("spokesman"),
      Seq("org:top_members/employees" -> 0.9))
    assert(spokesman.isEmpty)
    val alt = Scorer.betweenPass(cand("corporation", obj = "Acme",
        objType = NER.ORGANIZATION),
      Seq("org:alternate_names" -> 0.9))
    assert(alt.isEmpty)
  }

  test("X11 BornInRewrite: keep on birth words, rewrite on residence words, " +
       "drop distant unsupported") {
    def birth(between: String) = Scorer.betweenPass(
      cand(between, subj = "John Smith", subjType = NER.PERSON,
        obj = "Paris", objType = NER.CITY),
      Seq("per:city_of_birth" -> 0.9))
    assert(birth("was born in") == Seq("per:city_of_birth" -> 0.9))
    assert(birth("was raised in") == Seq("per:cities_of_residence" -> 0.9))
    assert(birth("a b") == Seq("per:city_of_birth" -> 0.9)) // close: keep
    assert(birth("a b c d e f g h i j").isEmpty) // distant, unsupported
  }

  test("X9 ExpandToMaximalPhraseRewrite: title absorbs preceding noun run") {
    val s = sentencesOf("Emma Wilson works as a software engineer now.").head
    val Mentions.Spans(_, slots) = Mentions.extract(s)
    assert(slots.exists(m => m.ner == NER.TITLE &&
      m.surface == "software engineer"), s"slots: ${slots.map(_.surface)}")
    // determiner boundary: "a" is not absorbed
    assert(!slots.exists(_.surface.contains("a software")))
  }
}
