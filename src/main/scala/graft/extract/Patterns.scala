package graft.extract

import graft.model.{NER, Relations}

/**
 * Rule/pattern-based relation extractor — the TokensRegex component of the
 * reference (classify/TokenRegexExtractor.java:22-105, rule files
 * defs.rules/<relation>.rules), re-expressed as a direction-aware phrase DSL
 * over the token window between/around the argument spans.
 *
 * A rule fires when (a) the pair is type-compatible with the relation
 * (entityType + validNamedEntityLabels, RelationType.java:76-97), and
 * (b) its phrase occurs in the between-token window in the required
 * direction. Rule hits carry score 1.0 (the reference's heuristic extractors
 * take precedence over statistical scores —
 * classify/HeuristicRelationExtractor.java:23-77).
 */
object Patterns {

  /** dir: +1 = entity(subj) precedes slot(obj); -1 = slot precedes entity;
   *  0 = either. maxDist: max tokens between the spans (Int.MaxValue = the
   *  global closeEnough gate only). objTypes: when non-empty, restricts the
   *  rule to these exact slot NER types (tighter than the relation's
   *  validNamedEntityLabels — disambiguates city/state/country rules that
   *  share a phrase like "born in"). atEnd: the phrase must END the
   *  between-window (verb-adjacent object — prevents "graduated from X and
   *  joined Y" from firing schools_attended on Y). */
  final case class Rule(rel: String, phrase: String, dir: Int,
                        maxDist: Int = Int.MaxValue,
                        objTypes: Set[String] = Set.empty,
                        atEnd: Boolean = false)

  /** Phrases that must sit immediately before the later span (their object
   *  follows the phrase directly in well-formed text). */
  private val endAnchored: Set[String] = Set(
    "born in", "born at", "lives in", "lived in", "resides in",
    "resided in", "moved to", "resident of", "home in",
    "headquartered in", "based in", "headquarters in",
    "graduated from", "studied at", "attended", "earned a degree from",
    "alumnus of", "alumna of", "joined", "hired by", "employed by",
    "works at", "works for", "worked at", "worked for",
    "member of", "belongs to", "sits on", "members include",
    "founded by", "cofounded by", "co-founded by", "established by",
    "created by", "started by", "founder of", "cofounder of",
    "co-founder of", "acquired", "bought", "owns", "owned by",
    "subsidiary of", "unit of", "division of", "parent of",
    "parent company of", "stake in", "shares of", "shareholder of",
    "invested in", "investor in", "charged with", "convicted of",
    "accused of", "pleaded guilty to", "indicted for", "also known as",
    "known as", "alias", "nicknamed", "formerly", "formerly known as",
    "died of", "died from", "succumbed to", "son of", "daughter of",
    "child of", "father of", "mother of", "cousin of", "uncle of",
    "aunt of", "grandfather of", "grandmother of", "nephew of",
    "niece of", "grandson of", "granddaughter of", "married",
    "married to", "wife of", "husband of", "wed", "employs",
    "practices", "converted to", "adheres to",
    "chief executive officer of", "ceo of", "president of",
    "chairman of", "director of", "head of", "led by", "headed by",
    "run by", "citizen of", "native of", "sibling of", "raised in")

  private def r(rel: String, dir: Int, maxDist: Int, phrases: String*): Seq[Rule] =
    phrases.map(p => Rule(rel, p, dir, maxDist, Set.empty, endAnchored(p)))

  private def rt(rel: String, dir: Int, maxDist: Int, objType: String,
                 phrases: String*): Seq[Rule] =
    phrases.map(p => Rule(rel, p, dir, maxDist, Set(objType), endAnchored(p)))

  val rules: Seq[Rule] =
    // --- person attributes
    r("per:age", 1, 2, ",") ++
    r("per:age", 1, 6, "aged", "is", "turned") ++
    rt("per:title", 1, 20, NER.TITLE, "is a", "is the", "was a", "was the",
      "works as", "serves as", "served as", "became", "named as", "as a") ++
    rt("per:title", 1, 3, NER.TITLE, "a", "the") ++
    rt("per:title", -1, 1, NER.TITLE, "") ++ // "chief executive John Smith"
    r("per:employee_of", 1, 25, "works at", "works for", "worked at",
      "worked for", "employed by", "employee of", "joined", "hired by",
      "works as", "serves as") ++
    r("per:employee_of", 1, 25, "chief executive officer of", "ceo of",
      "president of", "chairman of", "director of", "head of") ++
    r("per:member_of", 1, 12, "member of", "belongs to", "sits on") ++
    r("per:schools_attended", 1, 12, "graduated from", "studied at",
      "attended", "earned a degree from", "alumnus of", "alumna of") ++
    rt("per:origin", 1, 4, NER.NATIONALITY, "") ++ // "PER, a British lawyer"
    r("per:origin", 1, 12, "citizen of", "native of", "descent") ++
    r("per:religion", 1, 8, "practices", "converted to", "devout", "adheres to") ++
    r("per:charges", 1, 12, "charged with", "convicted of", "accused of",
      "pleaded guilty to", "indicted for") ++
    r("per:alternate_names", 1, 6, "also known as", "known as", "alias",
      "nicknamed") ++
    // --- birth / death / residence (objType-restricted: a shared phrase
    // like "born in" routes by the slot's NER type)
    // "raised in" is an AMBIGUOUS birth-ish phrase on purpose: it proposes
    // city_of_birth here and the X11 BornInRewrite pass (Scorer.betweenPass,
    // HeuristicSlotfillPostProcessors.java:453-499) rewrites it to
    // cities_of_residence because "raised" is a residence keyword
    rt("per:city_of_birth", 1, 15, NER.CITY, "born in", "born at",
      "raised in") ++
    rt("per:stateorprovince_of_birth", 1, 15, NER.STATE_OR_PROVINCE, "born in") ++
    rt("per:country_of_birth", 1, 15, NER.COUNTRY, "born in") ++
    r("per:date_of_birth", 1, 20, "born") ++
    rt("per:cities_of_residence", 1, 15, NER.CITY, "lives in", "lived in",
      "resides in", "resided in", "resident of", "home in", "moved to") ++
    rt("per:stateorprovinces_of_residence", 1, 15, NER.STATE_OR_PROVINCE,
      "lives in", "lived in", "resides in", "resided in", "moved to") ++
    rt("per:countries_of_residence", 1, 15, NER.COUNTRY, "lives in",
      "lived in", "resides in", "resided in", "moved to") ++
    rt("per:city_of_death", 1, 20, NER.CITY, "died", "passed away") ++
    rt("per:stateorprovince_of_death", 1, 20, NER.STATE_OR_PROVINCE,
      "died", "passed away") ++
    rt("per:country_of_death", 1, 20, NER.COUNTRY, "died", "passed away") ++
    r("per:date_of_death", 1, 20, "died", "passed away") ++
    r("per:cause_of_death", 1, 10, "died of", "died from", "succumbed to") ++
    // --- family (direction-sensitive!)
    r("per:spouse", 0, 10, "married", "married to", "wife of", "husband of",
      "wed", "wife", "husband") ++
    r("per:parents", 1, 5, "son of", "daughter of", "child of") ++
    r("per:children", -1, 5, "son of", "daughter of", "child of") ++
    r("per:children", 1, 8, "father of", "mother of", "parent of") ++
    r("per:parents", -1, 8, "father of", "mother of", "parent of") ++
    r("per:siblings", 0, 6, "brother", "sister", "sibling of") ++
    r("per:other_family", 0, 8, "cousin of", "uncle of", "aunt of",
      "grandfather of", "grandmother of", "nephew of", "niece of",
      "grandson of", "granddaughter of") ++
    // --- org attributes
    r("org:founded_by", 1, 12, "founded by", "cofounded by", "co-founded by",
      "established by", "created by", "started by") ++
    r("org:founded_by", -1, 6, "founder of", "cofounder of", "co-founder of") ++
    // active voice: "P founded O" / "P, who founded O" (slot-first)
    r("org:founded_by", -1, 4, "founded", "cofounded", "co-founded") ++
    r("org:founded", 1, 20, "founded", "established", "formed", "created") ++
    // year-first founding: "In 1946, P founded O" (slot date precedes)
    r("org:founded", -1, 6, "founded", "established", "formed") ++
    r("org:dissolved", 1, 15, "dissolved", "shut down", "disbanded", "closed") ++
    rt("org:city_of_headquarters", 1, 12, NER.CITY, "headquartered in",
      "based in", "headquarters in") ++
    rt("org:stateorprovince_of_headquarters", 1, 12, NER.STATE_OR_PROVINCE,
      "headquartered in", "based in", "headquarters in") ++
    rt("org:country_of_headquarters", 1, 12, NER.COUNTRY,
      "headquartered in", "based in", "headquarters in") ++
    r("org:number_of_employees/members", 1, 12, "employs", "has a staff of") ++
    r("org:top_members/employees", -1, 10, "chief executive officer of",
      "ceo of", "president of", "chairman of", "director of", "head of") ++
    r("org:top_members/employees", 1, 12, "led by", "headed by", "run by",
      "appointed", "named") ++
    r("org:subsidiaries", 1, 8, "acquired", "bought", "owns",
      "parent of", "parent company of") ++
    r("org:parents", -1, 8, "acquired", "bought", "owns", "parent of",
      "parent company of") ++
    r("org:parents", 1, 8, "subsidiary of", "unit of", "division of",
      "owned by") ++
    r("org:subsidiaries", -1, 8, "subsidiary of", "unit of", "division of",
      "owned by") ++
    r("org:member_of", 1, 10, "member of") ++
    r("org:members", -1, 10, "member of") ++
    r("org:members", 1, 10, "members include") ++
    r("org:shareholders", -1, 10, "stake in", "shares of", "shareholder of",
      "invested in", "investor in") ++
    r("org:political/religious_affiliation", 1, 8, "affiliated with",
      "aligned with", "adheres to") ++
    r("org:alternate_names", 1, 6, "also known as", "known as", "formerly",
      "formerly known as") ++
    r("org:website", 0, 8, "website", "site", "online at", "visit")

  /** rel -> rules, precomputed. */
  private val byRel: Map[String, Seq[Rule]] = rules.groupBy(_.rel)

  /** r6 (guide §1.2 step 2): matchBoth runs once per candidate pair and
   *  used to re-allocate " phrase " for every rule probed and re-walk
   *  Relations.all with a map lookup per relation. Both are loop
   *  invariants: the padded phrase is a property of the rule, and the
   *  (relation meta, rules) walk is a property of the entity type. Hit
   *  semantics are unchanged — same rules, same order, same gates. */
  private final case class CompiledRule(padded: String, dir: Int,
                                        maxDist: Int, objTypes: Set[String],
                                        atEnd: Boolean)
  private val byEntityType: Map[String, Array[(graft.model.RelationMeta, Array[CompiledRule])]] =
    Relations.all.groupBy(_.entityType).map { case (et, metas) =>
      et -> metas.map { meta =>
        meta -> byRel.getOrElse(meta.name, Nil).map(rl =>
          CompiledRule(if (rl.phrase.isEmpty) "" else " " + rl.phrase + " ",
            rl.dir, rl.maxDist, rl.objTypes, rl.atEnd)).toArray
      }.toArray
    }
  private val noRelations = Array.empty[(graft.model.RelationMeta, Array[CompiledRule])]

  /** Memoized "trigger=<rel>" / "rule=<rel>" feature strings (fixed
   *  domain: the 41 relation names) — built once, not per candidate. */
  val triggerFeature: Map[String, String] =
    Relations.all.map(m => m.name -> ("trigger=" + m.name)).toMap
  val ruleFeature: Map[String, String] =
    Relations.all.map(m => m.name -> ("rule=" + m.name)).toMap

  /** (rule hits, trigger hits): rule hits respect the full gate (entity
   *  type + slot type + rule objTypes); trigger hits ignore the slot-type
   *  gates and feed the LR trigger features (direction/distance-aware, so
   *  the statistical path cannot fire a phrase against the wrong argument
   *  order the way a bag-of-words trigger would). */
  def matchBoth(subjType: String, objType: String, entFirst: Boolean,
                betweenLc: Array[String]): (Seq[String], Seq[String]) = {
    val betweenStr = " " + betweenLc.mkString(" ") + " "
    val dist = betweenLc.length
    def phraseOk(rule: CompiledRule): Boolean =
      (rule.dir == 0 || (rule.dir == 1) == entFirst) &&
        dist <= rule.maxDist && {
          rule.padded.isEmpty ||
            (if (rule.atEnd) betweenStr.endsWith(rule.padded)
             else betweenStr.contains(rule.padded))
        }
    val ruleHits = Seq.newBuilder[String]
    val triggerHits = Seq.newBuilder[String]
    byEntityType.getOrElse(subjType, noRelations).foreach { case (meta, rs) =>
      var rule = false; var trig = false
      var i = 0
      while (i < rs.length && !(rule && trig)) {
        val rl = rs(i)
        if (phraseOk(rl)) {
          trig = true
          if (meta.validSlotTypes.contains(objType) &&
              (rl.objTypes.isEmpty || rl.objTypes.contains(objType)))
            rule = true
        }
        i += 1
      }
      if (rule) ruleHits += meta.name
      if (trig) triggerHits += meta.name
    }
    (ruleHits.result(), triggerHits.result())
  }

  def matchRelations(subjType: String, objType: String, entFirst: Boolean,
                     betweenLc: Array[String]): Seq[String] =
    matchBoth(subjType, objType, entFirst, betweenLc)._1
}
