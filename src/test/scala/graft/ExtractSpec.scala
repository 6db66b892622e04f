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

  test("A4 MODIFIER pass: common-noun NP prefix of an entity becomes a slot") {
    // "strategist" is in no title gazetteer (NER=O common noun), but it
    // premodifies the PERSON mention inside one NP -> MODIFIER slot
    // (SlotMentionAnnotator.java:172-243 findModifiers; like the
    // reference, the run accepts any NN*-tagged NER=O token, so an
    // untagged proper noun would join it)
    val s = sentencesOf("The strategist John Smith resigned.").head
    val Mentions.Spans(_, slots) = Mentions.extract(s)
    val mods = slots.filter(_.ner == NER.MODIFIER)
    assert(mods.exists(_.surface == "strategist"), slots.map(_.surface))
    // a gazetteer TITLE stays TITLE — never double-emitted as MODIFIER
    val t = sentencesOf("President John Smith resigned.").head
    val Mentions.Spans(_, tslots) = Mentions.extract(t)
    assert(!tslots.exists(m =>
      m.ner == NER.MODIFIER && m.surface.equalsIgnoreCase("president")))
  }

  test("B2 AlternateNamesExtractor: coref spans, frequency gate, subsidiary geo") {
    import graft.nlp.Annotator
    import graft.extract.AlternateNames
    // GDS resolves to the full org name via the acronym chain; the surface
    // "GDS" is neither the name nor a prefix/suffix of it -> alternate name
    val sents = Annotator.annotateText("https://x.example/alt",
      "Global Dynamics Systems announced earnings. GDS also expanded. GDS hired staff.")
    val fills = AlternateNames.extract(sents)
    val alt = fills.find(_.pred == "org:alternate_names")
    assert(alt.exists(f => f.subj == "Global Dynamics Systems" &&
      f.obj == "GDS" && f.score == 1.0), s"fills: $fills")
    // subsidiary detection: extra geo/of words flip the relation
    assert(AlternateNames.extract(Seq.empty).isEmpty)
    assert(AlternateNames.isSubsidiary(
      Seq("Acme", "of", "Canada"), "Acme Global Systems Inc."))
    assert(AlternateNames.isSubsidiary(
      Seq("Acme", "Ontario"), "Acme Global Systems Inc."))
    assert(!AlternateNames.isSubsidiary(
      Seq("Acme", "Systems"), "Acme Global Systems Inc."))
    // frequency gate: a value seen once among many literal mentions dies
    val many = Annotator.annotateText("https://x.example/alt3",
      ("Acme Systems Inc. grew. " * 30) + "ASI filed a report.")
    val gated = AlternateNames.extract(many, fraction = 0.5)
    assert(!gated.exists(_.obj == "ASI"), s"fills: $gated")
  }

  test("F2 gloss key: whitespace-normalized md5 datum identity") {
    import graft.extract.Candidates.glossKey
    val k = glossKey("John  Smith lives in Paris.", "John Smith", "Paris")
    // whitespace normalization makes the key stable across re-tokenization
    assert(k == glossKey(" John Smith lives in Paris. ", "John Smith", "Paris"))
    val parts = k.split(":")
    assert(parts.length == 3 && parts(0).length == 32 &&
      parts(1).length == 7 && parts(2).length == 7)
    assert(k != glossKey("John Smith lives in Paris.", "John Smith", "Lyon"))
  }

  test("A4 geography(): location pro-form becomes a typed slot via its antecedent") {
    import graft.nlp.Annotator
    val sents = Annotator.annotateText("https://x.example/geo",
      "Maria Keller visited Paris. Maria Keller lives there. Maria Keller toured Texas. Maria Keller worked there.")
    // sentence 2: "there" -> CITY slot normalized to Paris
    val s1 = graft.extract.Mentions.extract(sents(1))
    val citySlot = s1.slots.find(_.surface == "there")
    assert(citySlot.exists(m => m.ner == graft.model.NER.CITY &&
      m.normalized == "Paris"), s"slots: ${s1.slots}")
    // sentence 4: the antecedent is now the REGION Texas -> STATE slot
    val s3 = graft.extract.Mentions.extract(sents(3))
    val stateSlot = s3.slots.find(_.surface == "there")
    assert(stateSlot.exists(m =>
      m.ner == graft.model.NER.STATE_OR_PROVINCE &&
        m.normalized == "Texas"), s"slots: ${s3.slots}")
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

  test("inverted frozen-LR scoring is bit-identical to the per-relation walk") {
    assume(Scorer.frozen.nonEmpty)
    val rels = Scorer.frozen.keys.toSeq.sorted
    // real-shaped feature lists: memoized family strings, duplicates, and
    // trigger features that carry trained weight
    val featureLists = Seq(
      Seq("arg1type=PERSON", "arg2type=CITY", "dist_bin=1",
        "between_uni=born", "between_uni=in", "trigger=per:city_of_birth"),
      Seq("arg1type=ORGANIZATION", "arg2type=PERSON", "between_uni=chief",
        "between_uni=executive", "between_uni=chief", "dist_bin=2"),
      (1 to 120).map(i => s"between_uni=w$i"), // mostly hash-misses
      Seq.empty[String])
    featureLists.foreach { fs =>
      val fast = Scorer.scoreAllFrozen(fs)
      rels.foreach { rel =>
        val (slow, _) = Scorer.lrScoreAndThreshold(rel, fs)
        // bit-identical, not approximately equal: the CSR path must add
        // the same weights in the same feature order
        assert(java.lang.Double.doubleToRawLongBits(fast(rel)) ==
          java.lang.Double.doubleToRawLongBits(slow),
          s"$rel on ${fs.take(3)}...: fast=${fast(rel)} slow=$slow")
      }
    }
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
