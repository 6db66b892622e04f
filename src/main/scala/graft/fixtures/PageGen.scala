package graft.fixtures

import java.sql.Timestamp
import graft.model.{Page, Relations}
import graft.nlp.{Gazetteers, TextExtractor}

/**
 * Deterministic synthetic pages + gold triples (FIXTURES.md §1-2).
 *
 * Docs are assembled from fixed sentence templates with planted facts; the
 * generator emits the exact (subj, pred(official name), obj) triples the
 * full pipeline must recover (gate: P/R = 1.0 at small scale, standing in
 * for the ≥0.95 reference-parity gate — BASELINE.md).
 *
 * Global-consistency-by-construction: every fact is a FUNCTION of the
 * ENTITY's index (not the doc's), so one entity never carries conflicting
 * SINGLE-cardinality facts across documents (X15-safe), geo fills agree with
 * the gazetteer (X12-safe), and entity-pair spacings are distinct per
 * relation family so the same (subj, obj) pair never occurs under
 * implausibly-overlapping relations (X16-safe):
 *   spouse ±1 | parents/children ±2 | siblings ±3 | cousin ±5 | alt-name ±7.
 * Org names are injective below index 800 (adj×noun×noun2) and differ in a
 * non-strippable token, so the linker never merges two planted orgs.
 * Seeded by index only — no Random, no wall-clock.
 *
 * Reference analogue of this input: the fork's candidate_sentences.txt +
 * query XML (evaluate/SimpleSlotFiller.java:105-152,
 * spec/TaskXMLParser.java:25-117).
 */
object PageGen {

  final case class Gold(subj: String, pred: String, obj: String)

  // only geo-unambiguous cities: a city-state like "Singapore" would need
  // one surface form to NER-tag as CITY, STATE and COUNTRY at once
  private val cityList = Gazetteers.cities.keys.filter { c =>
    val (st, co) = Gazetteers.cities(c)
    st != c && co != c && !Gazetteers.states.contains(c) &&
      !Gazetteers.countries.contains(c)
  }.toSeq.sorted
  private val titleList = Seq("engineer", "economist", "journalist",
    "lawyer", "professor", "architect", "surgeon", "analyst", "editor",
    "consultant")
  private val topTitles = Seq("president", "chairman", "director")
  private val firstList = Gazetteers.firstNames.toSeq.sorted
  private val lastList = Gazetteers.lastNames
  private val religionList = Seq("Christianity", "Islam", "Judaism",
    "Buddhism", "Hinduism")
  private val ideologyList = Gazetteers.ideologies.toSeq.sorted
  private val chargeList = Gazetteers.criminalCharges.toSeq.sorted
  private val causeList = Seq("cancer", "pneumonia", "leukemia", "sepsis")
  private val monthNames = Seq("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")
  private val orgAdj = Seq("Global", "Northern", "Pacific", "Advanced",
    "Premier", "Sterling", "Summit", "Vertex", "Quantum", "Pinnacle")
  private val orgNoun = Seq("Dynamics", "Ventures", "Logistics",
    "Analytics", "Robotics", "Networks", "Materials", "Biotech",
    "Aerospace", "Energy")
  private val orgNoun2 = Seq("Avionics", "Semiconductors",
    "Pharmaceuticals", "Software", "Consulting", "Publishing", "Insurance",
    "Telecom")
  private val orgSuf = Seq("Inc.", "Corp.", "Group", "Ltd.")

  // ---- entity universes (injective at ANY corpus scale: beyond the base
  // combination space a deterministic letter suffix distinguishes names —
  // a real web corpus's entity universe grows with the corpus, and a
  // capped universe would make the per-entity pipeline stages
  // artificially constant-size)
  private def letterSuffix(m: Int): String = {
    if (m <= 0) ""
    else {
      var x = m; val sb = new StringBuilder
      while (x > 0) { sb.append(('a' + (x % 26)).toChar); x /= 26 }
      sb.toString
    }
  }
  private val personPeriod = 8000 // firstList(100) x lastList(80) mix period
  def person(k: Int): String = {
    val i = math.abs(k)
    firstList(i % firstList.size) + " " +
      lastList((i / firstList.size + i) % lastList.size) +
      letterSuffix(i / personPeriod)
  }
  /** Names differ in a non-strippable token at every scale. */
  def org(k: Int): String = {
    val i = math.abs(k)
    orgAdj(i % 10) + " " + orgNoun((i / 10) % 10) + " " +
      orgNoun2((i / 100) % 8) + letterSuffix(i / 800) + " " + orgSuf(i % 4)
  }
  private def aliasOf(k: Int): String = {
    val i = math.abs(k)
    orgAdj(i % 10) + " " + orgNoun((i / 10) % 10) + " " +
      orgNoun2((i / 100) % 8) + letterSuffix(i / 800) + " Holdings"
  }
  private def city(k: Int) = cityList(math.abs(k) % cityList.size)
  private def stateOf(c: String) = Gazetteers.cities(c)._1
  private def countryOf(c: String) = Gazetteers.cities(c)._2
  private def dateParts(k: Int): (String, Int, Int) = {
    val i = math.abs(k)
    (monthNames(i % 12), 1 + (i % 28), 1940 + (i % 70))
  }
  private def timex(k: Int): String = {
    val (_, d, y) = dateParts(k)
    f"$y%04d-${math.abs(k) % 12 + 1}%02d-$d%02d"
  }
  private def dateStr(k: Int): String = {
    val (m, d, y) = dateParts(k)
    s"$m $d, $y"
  }
  private def websiteOf(o: String): String =
    "https://www." + o.toLowerCase.filter(_.isLetter) + ".com"

  // ---- per-entity facts (functions of the ENTITY index)
  private def age(k: Int) = 25 + (math.abs(k) % 60)
  private def birthCity(k: Int) = city(k)
  private def birthDateK(k: Int) = k // timex(k)
  /** Residence city: the first city at ≥ k+7 whose COUNTRY differs from
   *  birthCity(k)'s. Keeps distant-supervision labels clean by
   *  construction — when birth and residence countries coincide, the
   *  (person, country) KB pair sits under BOTH country_of_birth and
   *  countries_of_residence, so "born in" training contexts get labeled
   *  residence and the residence classifier learns to fire on birth
   *  sentences (the precision-loss class the hand-authored eval's
   *  retrain exposed). */
  private def resCity(k: Int) = {
    val bc = countryOf(city(k))
    Iterator.from(7).map(d => city(k + d)).find(c => countryOf(c) != bc).get
  }
  private def deathCity(k: Int) = city(k + 11)
  private def deathDateK(k: Int) = k + 1
  private def causeOf(k: Int) = causeList(math.abs(k) % causeList.size)
  private def titleOf(k: Int) = titleList(math.abs(k) % titleList.size)
  private def religionOf(k: Int) = religionList(math.abs(k) % religionList.size)
  private def hqCity(k: Int) = city(k + 7)
  private def foundedYear(k: Int) = 1940 + (math.abs(k) % 70)
  private def employees(k: Int) = 500 + (math.abs(k) % 9000)
  private def dissolvedK(k: Int) = k + 2

  /** One template = text + gold triples (official 2013 pred names). */
  /** r6 (guide §1.2 step 2): each of the 39 templates is a THUNK — a
   *  page consumes only its 2-4 chosen templates (plus fillers), and the
   *  eager form built every sentence + Gold list per page just to throw
   *  ~90% away (PageGen was ~20% of single-thread page cost, and it runs
   *  inside every timed kg bench job). Selection indices and the built
   *  strings are unchanged, so pages stay byte-identical. */
  private def templates(i: Int): IndexedSeq[() => (String, Seq[Gold])] = {
    val p = person(i); val p2 = person(i + 1); val p3 = person(i + 2)
    val o = org(i); val o2 = org(i + 1); val o3 = org(i + 2)
    val off = Relations.officialName _

    Vector(
      // 0: flagship person bio
      () => (s"$p, ${age(i)}, was born in ${birthCity(i)} on ${dateStr(birthDateK(i))} and works as a ${titleOf(i)} at $o.",
        Seq(Gold(p, "per:age", age(i).toString),
          Gold(p, off("per:city_of_birth"), birthCity(i)),
          Gold(p, off("per:date_of_birth"), timex(birthDateK(i))),
          Gold(p, "per:title", titleOf(i)),
          Gold(p, off("per:employee_of"), o))),
      // 1: spouse (pair spacing 1)
      () => (s"$p2 married $p3 in ${city(i + 20)}.",
        Seq(Gold(p2, "per:spouse", p3), Gold(p3, "per:spouse", p2))),
      // 2: org founding
      () => (s"$o was founded by $p in ${foundedYear(i)} and is headquartered in ${hqCity(i)}.",
        Seq(Gold(o, "org:founded_by", p),
          Gold(o, off("org:founded"), s"${foundedYear(i)}-XX-XX"),
          Gold(o, off("org:city_of_headquarters"), hqCity(i)))),
      // 3: org alias + headcount
      () => (s"$o2, also known as ${aliasOf(i + 1)}, employs ${employees(i + 1)} people.",
        Seq(Gold(o2, "org:alternate_names", aliasOf(i + 1)),
          Gold(aliasOf(i + 1), "org:alternate_names", o2),
          Gold(o2, off("org:number_of_employees/members"), employees(i + 1).toString),
          Gold(aliasOf(i + 1), off("org:number_of_employees/members"), employees(i + 1).toString))),
      // 4: education + job
      () => (s"$p2 graduated from $o2 and joined $o3 as a ${titleOf(i + 1)}.",
        Seq(Gold(p2, "per:schools_attended", o2),
          Gold(p2, off("per:employee_of"), o3),
          Gold(p2, "per:title", titleOf(i + 1)))),
      // 5: death (city + cause + date; date keeps X17 satisfied)
      () => (s"$p3 died of ${causeOf(i + 2)} in ${deathCity(i + 2)} on ${dateStr(deathDateK(i + 2))}.",
        Seq(Gold(p3, "per:cause_of_death", causeOf(i + 2)),
          Gold(p3, off("per:city_of_death"), deathCity(i + 2)),
          Gold(p3, off("per:date_of_death"), timex(deathDateK(i + 2))))),
      // 6: nationality + title + residence
      () => (s"$p2, a ${natOf(i + 1)} ${titleOf(i + 1)}, lives in ${resCity(i + 1)}.",
        Seq(Gold(p2, "per:origin", natOf(i + 1)),
          Gold(p2, "per:title", titleOf(i + 1)),
          Gold(p2, off("per:cities_of_residence"), resCity(i + 1)))),
      // 7: charges
      () => (s"$p was charged with ${chargeList(i % chargeList.size)} in ${1990 + (i % 30)}.",
        Seq(Gold(p, "per:charges", chargeList(i % chargeList.size)))),
      // 8: acquisition (org pair spacing 3)
      () => (s"$o acquired ${org(i + 3)} in ${1990 + (i % 30)}.",
        Seq(Gold(o, "org:subsidiaries", org(i + 3)),
          Gold(org(i + 3), "org:parents", o))),
      // 9: top member
      () => (s"$p3 is the ${topTitles(i % 3)} of $o.",
        Seq(Gold(p3, "per:title", topTitles(i % 3)),
          Gold(o, off("org:top_members/employees"), p3),
          Gold(p3, off("per:employee_of"), o))),
      // 10: per member_of
      () => (s"$p is a member of $o3.",
        Seq(Gold(p, off("per:member_of"), o3))),
      // 11: religion
      () => (s"$p2 practices ${religionOf(i + 1)}.",
        Seq(Gold(p2, "per:religion", religionOf(i + 1)))),
      // 12: parents/children (pair spacing 2)
      () => (s"$p is the son of $p3.",
        Seq(Gold(p, "per:parents", p3), Gold(p3, "per:children", p))),
      // 13: website
      () => (s"$o's website is ${websiteOf(o)}.",
        Seq(Gold(o, "org:website", websiteOf(o)))),
      // 14: state of birth (consistent with birth city's state)
      () => (s"$p2 was born in ${stateOf(birthCity(i + 1))}.",
        Seq(Gold(p2, off("per:stateorprovince_of_birth"), stateOf(birthCity(i + 1))))),
      // 15: country of birth
      () => (s"$p3 was born in ${countryOf(birthCity(i + 2))}.",
        Seq(Gold(p3, off("per:country_of_birth"), countryOf(birthCity(i + 2))))),
      // 16: shareholders
      () => (s"$p holds a stake in $o2.",
        Seq(Gold(o2, "org:shareholders", p))),
      // 17: affiliation
      () => (s"$o3 is affiliated with the ${ideologyList(i % ideologyList.size)} movement.",
        Seq(Gold(o3, off("org:political/religious_affiliation"),
          ideologyList(i % ideologyList.size)))),
      // 18: dissolution
      () => (s"$o2 was dissolved on ${dateStr(dissolvedK(i + 1))}.",
        Seq(Gold(o2, off("org:dissolved"), timex(dissolvedK(i + 1))))),
      // 19: cousin (pair spacing 5)
      () => (s"$p is a cousin of ${person(i + 5)}.",
        Seq(Gold(p, "per:other_family", person(i + 5)),
          Gold(person(i + 5), "per:other_family", p))),
      // 20: siblings (pair spacing 3)
      () => (s"$p2 has a brother, ${person(i + 4)}.",
        Seq(Gold(p2, "per:siblings", person(i + 4)),
          Gold(person(i + 4), "per:siblings", p2))),
      // 21: org member_of/members (org pair spacing 5)
      () => (s"$o2 is a member of ${org(i + 6)}.",
        Seq(Gold(o2, "org:member_of", org(i + 6)),
          Gold(org(i + 6), "org:members", o2))),
      // 22: state of residence
      () => (s"$p lives in ${stateOf(resCity(i))}.",
        Seq(Gold(p, off("per:stateorprovinces_of_residence"), stateOf(resCity(i))))),
      // 23: country of residence
      () => (s"$p2 lives in ${countryOf(resCity(i + 1))}.",
        Seq(Gold(p2, off("per:countries_of_residence"), countryOf(resCity(i + 1))))),
      // 24: person alternate names (pair spacing 7)
      () => (s"$p3, also known as ${person(i + 9)}, wrote several novels.",
        Seq(Gold(p3, "per:alternate_names", person(i + 9)),
          Gold(person(i + 9), "per:alternate_names", p3))),
      // 25: state of death (consistent with death city's state + date)
      () => (s"$p2 passed away in ${stateOf(deathCity(i + 1))} on ${dateStr(deathDateK(i + 1))}.",
        Seq(Gold(p2, off("per:stateorprovince_of_death"), stateOf(deathCity(i + 1))),
          Gold(p2, off("per:date_of_death"), timex(deathDateK(i + 1))))),
      // 26: country of death
      () => (s"$p3 passed away in ${countryOf(deathCity(i + 2))} on ${dateStr(deathDateK(i + 2))}.",
        Seq(Gold(p3, off("per:country_of_death"), countryOf(deathCity(i + 2))),
          Gold(p3, off("per:date_of_death"), timex(deathDateK(i + 2))))),
      // 27: state of HQ (consistent with HQ city)
      () => (s"$o3 is based in ${stateOf(hqCity(i + 2))}.",
        Seq(Gold(o3, off("org:stateorprovince_of_headquarters"), stateOf(hqCity(i + 2))))),
      // 28: country of HQ
      () => (s"$o2 is headquartered in ${countryOf(hqCity(i + 1))}.",
        Seq(Gold(o2, off("org:country_of_headquarters"), countryOf(hqCity(i + 1))))),
      // 29: pronoun coref across sentences
      () => (s"$p was born in ${birthCity(i)}. He works at ${org(i + 5)}.",
        Seq(Gold(p, off("per:city_of_birth"), birthCity(i)),
          Gold(p, off("per:employee_of"), org(i + 5)))),
      // 30: X10 TopEmployeeRewrite fires e2e — "appointed" proposes
      // org:top_members, "founder" between the spans rewrites to founded_by
      () => (s"$o appointed founder $p3 in ${1990 + (i % 30)}.",
        Seq(Gold(o, "org:founded_by", p3),
          Gold(p3, "per:title", "founder"))),
      // 31: X11 BornInRewrite fires e2e — "raised in" proposes
      // city_of_birth, the residence keyword rewrites it
      () => (s"$p3 was raised in ${resCity(i + 2)}.",
        Seq(Gold(p3, off("per:cities_of_residence"), resCity(i + 2)))),
      // 32-38: structure-generalization forms the hand-authored eval set
      // (HandEval) exposed as gaps — participial openings, appositions,
      // reversed subordinate clauses, active-voice founding, age-first.
      // Phrasings stay DISJOINT from heldOutTemplates (that gate must
      // keep measuring unseen language). Facts reuse the same
      // entity-indexed fact functions, so cross-template consistency
      // holds unchanged.
      // 32: participial opening — slot precedes the entity
      () => (s"Born in ${birthCity(i + 1)}, $p2 later took up painting.",
        Seq(Gold(p2, off("per:city_of_birth"), birthCity(i + 1)))),
      // 33: age-first clause
      () => (s"At ${age(i + 2)}, $p3 remains a working ${titleOf(i + 2)}.",
        Seq(Gold(p3, "per:age", age(i + 2).toString),
          Gold(p3, "per:title", titleOf(i + 2)))),
      // 34: headquarters as an apposition
      () => (s"$o2, headquartered in ${hqCity(i + 1)}, reported earnings.",
        Seq(Gold(o2, off("org:city_of_headquarters"), hqCity(i + 1)))),
      // 35: title-before-name apposition + "works for"
      () => (s"The ${titleOf(i)} $p works for ${org(i + 5)}.",
        Seq(Gold(p, "per:title", titleOf(i)),
          Gold(p, off("per:employee_of"), org(i + 5)))),
      // 36: residence in the past perfect (was: a death-date + residence
      // combined sentence — dropped after measurement: distant
      // supervision could not stop the death-place/date classifiers
      // firing on the residence clause's city and "since YEAR", costing
      // main-corpus precision; the cross-clause distinction stays an
      // honest HandEval gap instead)
      () => (s"$p2 had lived in ${resCity(i + 1)} for two decades.",
        Seq(Gold(p2, off("per:cities_of_residence"), resCity(i + 1)))),
      // 37: active-voice founding, year first
      () => (s"In ${foundedYear(i)}, $p founded $o.",
        Seq(Gold(o, "org:founded_by", p),
          Gold(o, off("org:founded"), s"${foundedYear(i)}-XX-XX"))),
      // 38: reversed "where ... is headquartered" subordinate clause
      () => (s"$o3 employs ${employees(i + 2)} people in ${hqCity(i + 2)}, " +
        s"where $o3 is headquartered.",
        Seq(Gold(o3, off("org:number_of_employees/members"),
          employees(i + 2).toString),
          Gold(o3, off("org:city_of_headquarters"), hqCity(i + 2))))
    )
  }

  private val natList = Gazetteers.nationalities.keys.toSeq.sorted
  private def natOf(k: Int) = natList(math.abs(k) % natList.size)

  /** HELD-OUT template family: phrasings that appear in NO training
   *  corpus (TrainFreeze/MimlFreeze consume only `templates` via
   *  corpus()), used exclusively by corpusHeldOut — the
   *  template-generalization gate. Facts reuse the SAME entity-indexed
   *  fact functions as `templates`, so cross-corpus consistency (X12
   *  gazetteer agreement, X15 single-cardinality, X16 pair spacings)
   *  holds by construction; only the surface language is new. */
  private def heldOutTemplates(i: Int): Seq[(String, Seq[Gold])] = {
    val p = person(i); val p2 = person(i + 1); val p3 = person(i + 2)
    val o = org(i); val o2 = org(i + 1); val o3 = org(i + 2)
    val off = Relations.officialName _
    Seq(
      // employment, passive phrasing (train: "works as a T at O")
      (s"$p is employed by $o.",
        Seq(Gold(p, off("per:employee_of"), o))),
      // residence as an appositive (train: "lives in C")
      (s"$p2, a resident of ${resCity(i + 1)}, spoke to reporters.",
        Seq(Gold(p2, off("per:cities_of_residence"), resCity(i + 1)))),
      // education (train: "graduated from O")
      (s"$p2 studied at $o2.",
        Seq(Gold(p2, "per:schools_attended", o2))),
      // ownership stated from the subsidiary's side (train: "O acquired S")
      (s"${org(i + 3)} is a subsidiary of $o.",
        Seq(Gold(org(i + 3), "org:parents", o),
          Gold(o, "org:subsidiaries", org(i + 3)))),
      // charges (train: "charged with")
      (s"$p was indicted for ${chargeList(i % chargeList.size)}.",
        Seq(Gold(p, "per:charges", chargeList(i % chargeList.size)))),
      // spouse, kinship-noun phrasing (train: "married"); same ±1 pair
      (s"$p3 is the wife of $p2.",
        Seq(Gold(p3, "per:spouse", p2), Gold(p2, "per:spouse", p3))),
      // top member, passive (train: "is the president of")
      (s"$o is led by $p3.",
        Seq(Gold(o, off("org:top_members/employees"), p3))),
      // death place/date via "passed away in CITY" (train pairs the city
      // only with "died of CAUSE in"; states/countries with "passed away")
      (s"$p3 passed away in ${deathCity(i + 2)} on ${dateStr(deathDateK(i + 2))}.",
        Seq(Gold(p3, off("per:city_of_death"), deathCity(i + 2)),
          Gold(p3, off("per:date_of_death"), timex(deathDateK(i + 2))))),
      // cause of death (train: "died of")
      (s"$p3 succumbed to ${causeOf(i + 2)}.",
        Seq(Gold(p3, "per:cause_of_death", causeOf(i + 2)))),
      // person alias (train: "also known as"); same ±7 pair spacing
      (s"$p3, nicknamed ${person(i + 9)}, retired last year.",
        Seq(Gold(p3, "per:alternate_names", person(i + 9)),
          Gold(person(i + 9), "per:alternate_names", p3))),
      // founding (train: "was founded by P in Y")
      (s"$o3 was established by $p2 in ${foundedYear(i + 2)}.",
        Seq(Gold(o3, "org:founded_by", p2),
          Gold(o3, off("org:founded"), s"${foundedYear(i + 2)}-XX-XX")))
    )
  }

  /** One page from the held-out family (same page shape as `page`). */
  def pageHeldOut(i: Int): (Page, Seq[Gold]) = {
    val ts = heldOutTemplates(i)
    val nSent = 2 + (i % 3)
    val chosen = (0 until nSent).map(k => ts((i + k * 5) % ts.size))
    val sents = chosen.map(_._1) ++ (0 until 5).map(k => filler(i + k))
    val text = sents.mkString(" ")
    val gold = chosen.flatMap(_._2)
    val url = s"https://held-out-${i % 97}.example/page-$i"
    val html = ("<html><head><title>t</title></head><body><p>" +
      TextExtractor.escapeHtml(text) + "</p></body></html>")
      .getBytes("UTF-8")
    val warcTs = new Timestamp(1700000000000L + i.toLong * 37000L)
    (Page(url, warcTs, html, text, "en"), gold)
  }

  /** Held-out-template corpus: same entity universe, UNSEEN language.
   *  The e2e gate reports its P/R beside the in-template one — the
   *  in-template 1.0 measures mechanics, this measures generalization. */
  def corpusHeldOut(n: Int, offset: Int = 0): (Seq[Page], Set[Gold]) = {
    val all = (offset until offset + n).map(pageHeldOut)
    (all.map(_._1), all.flatMap(_._2).toSet)
  }

  /** Filler sentences with no gold (multibyte rows exercise the
   *  byte-identity invariant). */
  private def filler(i: Int): String = {
    val opts = Seq(
      "The quarterly report was published yesterday.",
      "Markets were mixed in early trading.",
      "Officials declined to comment on the matter.",
      "The café near the Müller bridge reopened — crowds followed.",
      "暴风雨过后，城市恢复了平静。",
      "Analysts expect further announcements soon.")
    opts(math.abs(i) % opts.size)
  }

  /** Planted related-links footer — the web-graph side of the corpus
   *  (`text/Links.extractLinks` recovers exactly these). Deterministic
   *  shape, function of the page index only:
   *   - a root-relative self "top" link (exercises /-resolution);
   *   - a hub link (hub = i - i%10) whose anchor is the hub entity's
   *     FULL name on ~2/3 of pages and its LAST name on the rest (i%3==0)
   *     — so `Links.aliasPairs` mines (last-name → full-name) alias
   *     evidence per hub with the full name strictly more frequent, the
   *     classic anchor-text alias signal;
   *   - a next-page link with a full-name anchor;
   *   - every 5th page a mailto: (extraction must drop it);
   *   - every 4th page a directory-relative href (exercises dir join).
   *  The block sits in <nav>, which TextExtractor drops (graft-extract-2),
   *  so the byte-identical text invariant is untouched. */
  private[graft] def hubOf(i: Int): Int = i - (i % 10)
  private[graft] def hubEntity(i: Int): String = person(hubOf(i) + 2)
  private[graft] def lastName(full: String): String =
    full.split(' ').last
  private def navBlock(i: Int, url: String): String = {
    val hub = hubOf(i)
    val hubName = hubEntity(i)
    val hubAnchor = if (i % 3 == 0) lastName(hubName) else hubName
    val esc = TextExtractor.escapeHtml _
    val sb = new StringBuilder("<nav class=\"rel\">")
    sb.append(s"""<a href="/page-$i">top</a>""")
    sb.append(s"""<a href="https://site-${hub % 97}.example/page-$hub">${esc(hubAnchor)}</a>""")
    sb.append(s"""<a href="https://site-${(i + 1) % 97}.example/page-${i + 1}">${esc(person(i + 3))}</a>""")
    if (i % 5 == 0) sb.append("""<a href="mailto:ed@example.org">contact</a>""")
    if (i % 4 == 0) sb.append(s"""<a href="archive-${i % 8}.html">archive</a>""")
    sb.append("</nav>")
    sb.toString
  }

  /** Build one page (2-4 template sentences + several fillers — realistic
   *  Common-Crawl pages are KBs, not one-liners) and its gold. */
  def page(i: Int): (Page, Seq[Gold]) = {
    val ts = templates(i)
    val nSent = 2 + (i % 3)
    val chosen = (0 until nSent).map(k => ts((i + k * 7) % ts.size)())
    val sents = chosen.map(_._1) ++ (0 until 5).map(k => filler(i + k))
    val text = sents.mkString(" ")
    val gold = chosen.flatMap(_._2)
    val url = s"https://site-${i % 97}.example/page-$i"
    val html = ("<html><head><title>t</title></head><body><p>" +
      TextExtractor.escapeHtml(text) + "</p>" + navBlock(i, url) +
      "</body></html>").getBytes("UTF-8")
    val lang = if (i % 20 == 19) Seq("de", "fr")(i % 2) else "en"
    val warcTs = new Timestamp(1700000000000L + i.toLong * 37000L)
    (Page(url, warcTs, html, text, lang), if (lang == "en") gold else Nil)
  }

  /** n pages + deduplicated gold triple set (entity names injective at any
   *  n). `offset` shifts the index range: training tools use a FAR offset
   *  (e.g. 10000) so the entities/thresholds they fit are disjoint from
   *  the [0, 150) evaluation corpus the P/R gates run on — the templates
   *  are shared (the generator IS the corpus language) but the shipped
   *  model never sees an evaluation entity. */
  def corpus(n: Int, offset: Int = 0): (Seq[Page], Set[Gold]) = {
    val all = (offset until offset + n).map(page)
    (all.map(_._1), all.flatMap(_._2).toSet)
  }
}
