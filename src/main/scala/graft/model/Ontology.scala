package graft.model

/**
 * The KBP ontology: 18 NER/fill types and 41 relations, re-expressed from the
 * reference's enums (public TAC-KBP 2013 ontology).
 *
 * Reference: stanford/src/main/java/edu/stanford/nlp/kbp/slotfilling/common/
 * NERTag.java:8-27 and RelationType.java:15-59 (fields :76-97, overlap matrix
 * :265-291, slot-type routing :292-300).
 *
 * Stored as plain STRINGs in DataFrames; this object is the broadcastable
 * driver-side metadata (a few KB — always broadcast, never shuffled).
 */
object NER {
  val CAUSE_OF_DEATH    = "CAUSE_OF_DEATH"
  val CITY              = "CITY"
  val COUNTRY           = "COUNTRY"
  val CRIMINAL_CHARGE   = "CRIMINAL_CHARGE"
  val DATE              = "DATE"
  val IDEOLOGY          = "IDEOLOGY"
  val LOCATION          = "LOCATION"
  val MISC              = "MISC"
  val MODIFIER          = "MODIFIER"
  val NATIONALITY       = "NATIONALITY"
  val NUMBER            = "NUMBER"
  val ORGANIZATION      = "ORGANIZATION"
  val PERSON            = "PERSON"
  val RELIGION          = "RELIGION"
  val STATE_OR_PROVINCE = "STATE_OR_PROVINCE"
  val TITLE             = "TITLE"
  val URL               = "URL"
  val DURATION          = "DURATION"

  /** tag -> stable short name (NERTag.java: serialization-stable). */
  val shortName: Map[String, String] = Map(
    CAUSE_OF_DEATH -> "COD", CITY -> "CIT", COUNTRY -> "CRY",
    CRIMINAL_CHARGE -> "CC", DATE -> "DT", IDEOLOGY -> "IDY",
    LOCATION -> "LOC", MISC -> "MSC", MODIFIER -> "MOD",
    NATIONALITY -> "NAT", NUMBER -> "NUM", ORGANIZATION -> "ORG",
    PERSON -> "PER", RELIGION -> "REL", STATE_OR_PROVINCE -> "ST",
    TITLE -> "TIT", URL -> "URL", DURATION -> "DUR")

  val all: Seq[String] = shortName.keys.toSeq.sorted
  private val byShort = shortName.map(_.swap)

  /** NERTag.fromString semantics: long name first, then short name. */
  def fromString(s: String): Option[String] = {
    if (s == null || s.isEmpty) None
    else {
      val u = s.toUpperCase
      if (shortName.contains(u)) Some(u) else byShort.get(u)
    }
  }

  /** Only PER/ORG are "official" entity (left-arg) types (NERTag.java:87-89). */
  def isEntityType(t: String): Boolean = t == PERSON || t == ORGANIZATION
}

/** One row of the relation ontology (RelationType.java:76-97). */
final case class RelationMeta(
    name: String,              // canonical 2010 name, e.g. "per:city_of_birth"
    entityType: String,        // left-arg NER type: PERSON | ORGANIZATION
    single: Boolean,           // Cardinality.SINGLE (argmax-per-entity) vs LIST
    validSlotTypes: Set[String], // valid right-arg NER types
    primarySlotType: String,   // first-declared (most specific) slot type
    validPosPrefixes: Set[String],
    prior: Double) {
  def isDateRelation: Boolean = validSlotTypes.contains(NER.DATE)
}

object Relations {
  import NER._
  private def r(n: String, et: String, single: Boolean, slots: Seq[String],
                pos: Seq[String], prior: Double) =
    RelationMeta(n, et, single, slots.toSet, slots.head, pos.toSet, prior)

  /** All 41 relations, in the reference's declaration order
   *  (RelationType.java:16-58). */
  val all: Seq[RelationMeta] = Seq(
    r("per:alternate_names", PERSON, single = false, Seq(PERSON, MISC), Seq("NNP"), 0.03530272703081071),
    r("per:children", PERSON, single = false, Seq(PERSON), Seq("NNP"), 0.005842811028450441),
    r("per:cities_of_residence", PERSON, single = false, Seq(CITY, LOCATION), Seq("NNP"), 0.013610567967511656),
    r("per:city_of_birth", PERSON, single = true, Seq(CITY, LOCATION, STATE_OR_PROVINCE), Seq("NNP"), 0.03581469611597691),
    r("per:city_of_death", PERSON, single = true, Seq(CITY, LOCATION, STATE_OR_PROVINCE), Seq("NNP"), 0.010200333213777465),
    r("per:countries_of_residence", PERSON, single = false, Seq(COUNTRY, LOCATION), Seq("NNP"), 0.010778829355208202),
    r("per:country_of_birth", PERSON, single = true, Seq(COUNTRY, LOCATION, NATIONALITY), Seq("NNP"), 0.022344413462762204),
    r("per:country_of_death", PERSON, single = true, Seq(COUNTRY, LOCATION, NATIONALITY), Seq("NNP"), 0.00606263956219412),
    r("per:employee_of", PERSON, single = false, Seq(ORGANIZATION, COUNTRY, STATE_OR_PROVINCE), Seq("NNP"), 0.03352819011697192),
    r("per:member_of", PERSON, single = false, Seq(ORGANIZATION), Seq("NNP"), 0.05217167451493099),
    r("per:origin", PERSON, single = false, Seq(NATIONALITY, COUNTRY, LOCATION), Seq("NNP"), 0.006979555946361838),
    r("per:other_family", PERSON, single = false, Seq(PERSON), Seq("NNP"), 2.747856671795999e-5),
    r("per:parents", PERSON, single = false, Seq(PERSON), Seq("NNP"), 0.003222223507769203),
    r("per:schools_attended", PERSON, single = false, Seq(ORGANIZATION), Seq("NNP"), 0.005469681017227615),
    r("per:siblings", PERSON, single = false, Seq(PERSON), Seq("NNP"), 1.0e-99),
    r("per:spouse", PERSON, single = false, Seq(PERSON), Seq("NNP"), 0.016407596811329268),
    r("per:stateorprovince_of_birth", PERSON, single = true, Seq(STATE_OR_PROVINCE, LOCATION, COUNTRY), Seq("NNP"), 0.016582591894112066),
    r("per:stateorprovince_of_death", PERSON, single = true, Seq(STATE_OR_PROVINCE, LOCATION, COUNTRY), Seq("NNP"), 0.005008330344436603),
    r("per:stateorprovinces_of_residence", PERSON, single = false, Seq(STATE_OR_PROVINCE, LOCATION, COUNTRY), Seq("NNP"), 0.006678737952817855),
    r("per:age", PERSON, single = true, Seq(NUMBER, DURATION), Seq("CD", "NN"), 0.04831599773229513),
    r("per:date_of_birth", PERSON, single = true, Seq(DATE), Seq("CD", "NN"), 0.07435844777915332),
    r("per:date_of_death", PERSON, single = true, Seq(DATE), Seq("CD", "NN"), 0.018981904640696046),
    r("per:cause_of_death", PERSON, single = true, Seq(CAUSE_OF_DEATH), Seq("NN"), 1.0123682475037891e-5),
    r("per:charges", PERSON, single = false, Seq(CRIMINAL_CHARGE), Seq("NN"), 3.861461744050167e-4),
    r("per:religion", PERSON, single = true, Seq(RELIGION), Seq("NN"), 7.665073873957261e-4),
    r("per:title", PERSON, single = false, Seq(TITLE, ORGANIZATION, MODIFIER), Seq("NN"), 0.03342839953257512),
    r("org:alternate_names", ORGANIZATION, single = false, Seq(ORGANIZATION, MISC), Seq("NNP"), 0.0552058867767352),
    r("org:city_of_headquarters", ORGANIZATION, single = true, Seq(CITY, LOCATION, STATE_OR_PROVINCE), Seq("NNP"), 0.055594925431847374),
    r("org:country_of_headquarters", ORGANIZATION, single = true, Seq(COUNTRY, LOCATION, NATIONALITY), Seq("NNP"), 0.05802171674514931),
    r("org:founded_by", ORGANIZATION, single = false, Seq(PERSON, ORGANIZATION), Seq("NNP"), 0.005080642362115445),
    r("org:member_of", ORGANIZATION, single = false, Seq(ORGANIZATION, LOCATION, COUNTRY, STATE_OR_PROVINCE), Seq("NNP"), 0.039629878168712614),
    r("org:members", ORGANIZATION, single = false, Seq(ORGANIZATION, COUNTRY), Seq("NNP"), 0.0012220730987724312),
    r("org:parents", ORGANIZATION, single = false, Seq(ORGANIZATION, LOCATION, COUNTRY, STATE_OR_PROVINCE), Seq("NNP"), 0.05500485936758802),
    r("org:political/religious_affiliation", ORGANIZATION, single = false, Seq(IDEOLOGY, RELIGION), Seq("NN", "JJ"), 0.005926692968957897),
    r("org:shareholders", ORGANIZATION, single = false, Seq(PERSON, ORGANIZATION), Seq("NNP"), 1.1569922828614734e-5),
    r("org:stateorprovince_of_headquarters", ORGANIZATION, single = true, Seq(STATE_OR_PROVINCE, LOCATION, COUNTRY), Seq("NNP"), 0.03126193148291701),
    r("org:subsidiaries", ORGANIZATION, single = false, Seq(ORGANIZATION), Seq("NNP"), 0.016241279170667932),
    r("org:top_members/employees", ORGANIZATION, single = false, Seq(PERSON), Seq("NNP"), 0.09071687241846098),
    r("org:dissolved", ORGANIZATION, single = true, Seq(DATE), Seq("CD", "NN"), 0.0023877428237553656),
    r("org:founded", ORGANIZATION, single = true, Seq(DATE), Seq("CD", "NN"), 0.07963144010829448),
    r("org:number_of_employees/members", ORGANIZATION, single = true, Seq(NUMBER), Seq("CD", "NN"), 0.036627483194687095),
    r("org:website", ORGANIZATION, single = true, Seq(URL), Seq("NNP"), 0.005154400620147864)
  )

  val byName: Map[String, RelationMeta] = all.map(m => m.name -> m).toMap
  val names: Seq[String] = all.map(_.name)
  val singleValued: Set[String] = all.filter(_.single).map(_.name).toSet

  /** slot NER type -> relations accepting it (RelationType.java:292-300). */
  val slotTypeToRelations: Map[String, Seq[RelationMeta]] =
    all.flatMap(m => m.validSlotTypes.map(_ -> m))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }

  /** Plausibly co-occurring relation pairs for the same (entity, slotValue)
   *  (RelationType.java:265-291, symmetrized — the reference checks
   *  `plausiblyCooccursWith` in both directions). */
  val plausibleOverlap: Set[(String, String)] = {
    val raw = Seq(
      "per:stateorprovince_of_death" -> Seq("per:stateorprovinces_of_residence"),
      "per:stateorprovince_of_birth" -> Seq("per:stateorprovinces_of_residence", "per:stateorprovince_of_death"),
      "per:spouse" -> Seq("per:title", "per:stateorprovince_of_birth"),
      "per:schools_attended" -> Seq("per:stateorprovinces_of_residence", "per:stateorprovince_of_birth"),
      "per:parents" -> Seq("per:spouse"),
      "per:member_of" -> Seq("per:stateorprovinces_of_residence", "per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:spouse", "per:schools_attended", "per:origin"),
      "per:employee_of" -> Seq("per:stateorprovinces_of_residence", "per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of"),
      "per:date_of_birth" -> Seq("per:date_of_death"),
      "per:country_of_death" -> Seq("per:stateorprovince_of_birth", "per:member_of", "per:employee_of"),
      "per:country_of_birth" -> Seq("per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death"),
      "per:countries_of_residence" -> Seq("per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death", "per:country_of_birth"),
      "per:city_of_death" -> Seq("per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_death", "per:country_of_birth"),
      "per:city_of_birth" -> Seq("per:stateorprovince_of_death", "per:stateorprovince_of_birth", "per:spouse", "per:schools_attended", "per:member_of", "per:employee_of", "per:country_of_birth", "per:countries_of_residence", "per:city_of_death"),
      "per:cities_of_residence" -> Seq("per:stateorprovinces_of_residence", "per:stateorprovince_of_birth", "per:schools_attended", "per:member_of", "per:employee_of", "per:city_of_death", "per:city_of_birth"),
      "per:children" -> Seq("per:spouse", "per:parents", "per:city_of_death"),
      "per:alternate_names" -> Seq("per:stateorprovince_of_birth", "per:spouse", "per:parents", "per:origin", "per:member_of", "per:country_of_birth", "per:city_of_death", "per:city_of_birth", "per:children"),
      "org:subsidiaries" -> Seq("org:top_members/employees"),
      "org:stateorprovince_of_headquarters" -> Seq("org:top_members/employees", "org:subsidiaries"),
      "org:parents" -> Seq("org:top_members/employees", "org:stateorprovince_of_headquarters"),
      "org:member_of" -> Seq("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:parents", "org:members"),
      "org:founded_by" -> Seq("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:parents"),
      "org:founded" -> Seq("org:number_of_employees/members"),
      "org:dissolved" -> Seq("org:number_of_employees/members", "org:founded"),
      "org:country_of_headquarters" -> Seq("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:parents", "org:members", "org:member_of", "org:founded_by"),
      "org:city_of_headquarters" -> Seq("org:top_members/employees", "org:subsidiaries", "org:stateorprovince_of_headquarters", "org:parents", "org:member_of", "org:founded_by", "org:country_of_headquarters"),
      "org:alternate_names" -> Seq("org:top_members/employees", "org:stateorprovince_of_headquarters", "org:political/religious_affiliation", "org:founded_by", "org:country_of_headquarters", "org:city_of_headquarters")
    )
    raw.flatMap { case (a, bs) => bs.flatMap(b => Seq(a -> b, b -> a)) }.toSet
  }

  /** Year-specific canonical renames applied at output time — "the
   *  canonicalization step" (OfficialOutputWriter.officialRelationName,
   *  evaluate/OfficialOutputWriter.java:134-198; 2013 renames). */
  val official2013: Map[String, String] = Map(
    "per:employee_of" -> "per:employee_or_member_of",
    "per:member_of" -> "per:employee_or_member_of",
    "per:stateorprovinces_of_residence" -> "per:statesorprovinces_of_residence",
    "org:political/religious_affiliation" -> "org:political_religious_affiliation",
    "org:top_members/employees" -> "org:top_members_employees",
    "org:number_of_employees/members" -> "org:number_of_employees_members",
    "org:founded" -> "org:date_founded",
    "org:dissolved" -> "org:date_dissolved"
  )
  def officialName(rel: String): String = official2013.getOrElse(rel, rel)

  /** Cross-year name aliases accepted on input (RelationType.fromString,
   *  RelationType.java:312-350). */
  def fromString(s: String): Option[RelationMeta] = {
    val n = s.trim.toLowerCase
    byName.get(n).orElse(byName.get(n match {
      case "per:employee_or_member_of" => "per:employee_of"
      case "per:statesorprovinces_of_residence" => "per:stateorprovinces_of_residence"
      case "org:political_religious_affiliation" => "org:political/religious_affiliation"
      case "org:number_of_employees_members" |
           "org:number_of_employees" | "org:number_of_members" => "org:number_of_employees/members"
      case "org:top_members_employees" |
           "org:top_members" | "org:top_employees" => "org:top_members/employees"
      case "org:date_founded" => "org:founded"
      case "org:date_dissolved" => "org:dissolved"
      case other => other
    }))
  }
}
