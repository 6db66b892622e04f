package graft.nlp

/**
 * Deterministic in-repo gazetteers (public geographic/name knowledge).
 *
 * Stand-ins for the reference's resource files — kbp_cities.tab /
 * kbp_regions.tab / kbp_countries.tab (loader
 * evaluate/WorldKnowledgePostProcessor.java:120-220), common_names.txt
 * (ir/PostIRAnnotator.java:77-93), kbp_regexner_mapping.tab and
 * keywords_no_ml triggers (process/PreFeaturizerAnnotator.java:61-88).
 * Tiny dimension data: broadcast to executors, never shuffled.
 */
object Gazetteers {

  /** city -> (state_or_province, country). */
  val cities: Map[String, (String, String)] = Map(
    "New York" -> ("New York", "United States"),
    "Los Angeles" -> ("California", "United States"),
    "San Francisco" -> ("California", "United States"),
    "Palo Alto" -> ("California", "United States"),
    "Seattle" -> ("Washington", "United States"),
    "Chicago" -> ("Illinois", "United States"),
    "Boston" -> ("Massachusetts", "United States"),
    "Austin" -> ("Texas", "United States"),
    "Houston" -> ("Texas", "United States"),
    "Denver" -> ("Colorado", "United States"),
    "Miami" -> ("Florida", "United States"),
    "Atlanta" -> ("Georgia", "United States"),
    "Detroit" -> ("Michigan", "United States"),
    "Portland" -> ("Oregon", "United States"),
    "Philadelphia" -> ("Pennsylvania", "United States"),
    "Toronto" -> ("Ontario", "Canada"),
    "Vancouver" -> ("British Columbia", "Canada"),
    "Montreal" -> ("Quebec", "Canada"),
    "London" -> ("England", "United Kingdom"),
    "Manchester" -> ("England", "United Kingdom"),
    "Edinburgh" -> ("Scotland", "United Kingdom"),
    "Paris" -> ("Ile-de-France", "France"),
    "Lyon" -> ("Auvergne-Rhone-Alpes", "France"),
    "Berlin" -> ("Berlin", "Germany"),
    "Munich" -> ("Bavaria", "Germany"),
    "Hamburg" -> ("Hamburg", "Germany"),
    "Madrid" -> ("Madrid", "Spain"),
    "Barcelona" -> ("Catalonia", "Spain"),
    "Rome" -> ("Lazio", "Italy"),
    "Milan" -> ("Lombardy", "Italy"),
    "Amsterdam" -> ("North Holland", "Netherlands"),
    "Brussels" -> ("Brussels", "Belgium"),
    "Zurich" -> ("Zurich", "Switzerland"),
    "Geneva" -> ("Geneva", "Switzerland"),
    "Vienna" -> ("Vienna", "Austria"),
    "Stockholm" -> ("Stockholm", "Sweden"),
    "Oslo" -> ("Oslo", "Norway"),
    "Copenhagen" -> ("Capital Region", "Denmark"),
    "Helsinki" -> ("Uusimaa", "Finland"),
    "Dublin" -> ("Leinster", "Ireland"),
    "Lisbon" -> ("Lisbon", "Portugal"),
    "Warsaw" -> ("Masovia", "Poland"),
    "Prague" -> ("Prague", "Czech Republic"),
    "Budapest" -> ("Budapest", "Hungary"),
    "Athens" -> ("Attica", "Greece"),
    "Moscow" -> ("Moscow", "Russia"),
    "Tokyo" -> ("Tokyo", "Japan"),
    "Osaka" -> ("Osaka", "Japan"),
    "Beijing" -> ("Beijing", "China"),
    "Shanghai" -> ("Shanghai", "China"),
    "Seoul" -> ("Seoul", "South Korea"),
    "Mumbai" -> ("Maharashtra", "India"),
    "Delhi" -> ("Delhi", "India"),
    "Bangalore" -> ("Karnataka", "India"),
    "Sydney" -> ("New South Wales", "Australia"),
    "Melbourne" -> ("Victoria", "Australia"),
    "Auckland" -> ("Auckland", "New Zealand"),
    "Sao Paulo" -> ("Sao Paulo", "Brazil"),
    "Rio de Janeiro" -> ("Rio de Janeiro", "Brazil"),
    "Buenos Aires" -> ("Buenos Aires", "Argentina"),
    "Mexico City" -> ("Mexico City", "Mexico"),
    "Cairo" -> ("Cairo", "Egypt"),
    "Lagos" -> ("Lagos", "Nigeria"),
    "Nairobi" -> ("Nairobi", "Kenya"),
    "Johannesburg" -> ("Gauteng", "South Africa"),
    "Cape Town" -> ("Western Cape", "South Africa"),
    "Tel Aviv" -> ("Tel Aviv", "Israel"),
    "Istanbul" -> ("Istanbul", "Turkey"),
    "Dubai" -> ("Dubai", "United Arab Emirates"),
    "Singapore" -> ("Singapore", "Singapore"))

  val states: Set[String] = cities.values.map(_._1).toSet ++ Set(
    "Arizona", "Nevada", "Utah", "Ohio", "Virginia", "Maryland",
    "New Jersey", "Connecticut", "Minnesota", "Wisconsin", "Missouri",
    "Tennessee", "Alabama", "Louisiana", "Oklahoma", "Kansas", "Iowa")

  val countries: Set[String] = cities.values.map(_._2).toSet ++ Set(
    "Austria", "Chile", "Colombia", "Peru", "Thailand", "Vietnam",
    "Indonesia", "Malaysia", "Philippines", "Saudi Arabia", "Ukraine")

  /** nationality adjective -> country (kbp_nationalities format). */
  val nationalities: Map[String, String] = Map(
    "American" -> "United States", "Canadian" -> "Canada",
    "British" -> "United Kingdom", "English" -> "United Kingdom",
    "Scottish" -> "United Kingdom", "French" -> "France",
    "German" -> "Germany", "Spanish" -> "Spain", "Italian" -> "Italy",
    "Dutch" -> "Netherlands", "Belgian" -> "Belgium",
    "Swiss" -> "Switzerland", "Austrian" -> "Austria",
    "Swedish" -> "Sweden", "Norwegian" -> "Norway", "Danish" -> "Denmark",
    "Finnish" -> "Finland", "Irish" -> "Ireland",
    "Portuguese" -> "Portugal", "Polish" -> "Poland",
    "Czech" -> "Czech Republic", "Hungarian" -> "Hungary",
    "Greek" -> "Greece", "Russian" -> "Russia", "Japanese" -> "Japan",
    "Chinese" -> "China", "Korean" -> "South Korea", "Indian" -> "India",
    "Australian" -> "Australia", "Brazilian" -> "Brazil",
    "Argentine" -> "Argentina", "Mexican" -> "Mexico",
    "Egyptian" -> "Egypt", "Nigerian" -> "Nigeria", "Kenyan" -> "Kenya",
    "Israeli" -> "Israel", "Turkish" -> "Turkey")

  /** Common first names (common_names.txt stand-in; guards approximate
   *  coref and person detection). */
  val firstNames: Set[String] = Set(
    "James", "John", "Robert", "Michael", "William", "David", "Richard",
    "Joseph", "Thomas", "Charles", "Christopher", "Daniel", "Matthew",
    "Anthony", "Mark", "Donald", "Steven", "Paul", "Andrew", "Joshua",
    "Kenneth", "Kevin", "Brian", "George", "Edward", "Ronald", "Timothy",
    "Jason", "Jeffrey", "Ryan", "Jacob", "Gary", "Nicholas", "Eric",
    "Jonathan", "Stephen", "Larry", "Justin", "Scott", "Brandon",
    "Mary", "Patricia", "Jennifer", "Linda", "Elizabeth", "Barbara",
    "Susan", "Jessica", "Sarah", "Karen", "Nancy", "Lisa", "Betty",
    "Margaret", "Sandra", "Ashley", "Kimberly", "Emily", "Donna",
    "Michelle", "Carol", "Amanda", "Dorothy", "Melissa", "Deborah",
    "Stephanie", "Rebecca", "Laura", "Sharon", "Cynthia", "Kathleen",
    "Amy", "Angela", "Shirley", "Anna", "Brenda", "Pamela", "Emma",
    "Nicole", "Helen", "Samantha", "Katherine", "Christine", "Debra",
    "Rachel", "Carolyn", "Janet", "Catherine", "Maria", "Heather",
    // NOTE: no names that collide with geo gazetteers (Virginia, Victoria)
    "Diane", "Ruth", "Julie", "Olivia", "Joyce", "Gloria", "Teresa",
    "Kelly", "Lauren", "Christina", "Joan", "Evelyn", "Judith")

  val lastNames: Seq[String] = Seq(
    "Smith", "Johnson", "Williams", "Brown", "Jones", "Garcia", "Miller",
    "Davis", "Rodriguez", "Martinez", "Hernandez", "Lopez", "Gonzalez",
    "Wilson", "Anderson", "Taylor", "Moore", "Jackson", "Martin", "Lee",
    "Perez", "Thompson", "White", "Harris", "Sanchez", "Clark", "Ramirez",
    "Lewis", "Robinson", "Walker", "Young", "Allen", "King", "Wright",
    "Scott", "Torres", "Nguyen", "Hill", "Flores", "Green", "Adams",
    "Nelson", "Baker", "Hall", "Rivera", "Campbell", "Mitchell", "Carter",
    "Roberts", "Gomez", "Phillips", "Evans", "Turner", "Diaz", "Parker",
    "Cruz", "Edwards", "Collins", "Reyes", "Stewart", "Morris", "Morales",
    "Murphy", "Cook", "Rogers", "Gutierrez", "Ortiz", "Morgan", "Cooper",
    "Peterson", "Bailey", "Reed", "Kelly", "Howard", "Ramos", "Kim",
    "Cox", "Ward", "Richardson", "Watson")

  /** Multi-word org "head" stems + legal/organizational suffixes that mark a
   *  capitalized run as ORGANIZATION. */
  val orgSuffixes: Set[String] = Set(
    "Inc.", "Inc", "Corp.", "Corp", "Corporation", "Co.", "Company",
    "Ltd.", "Ltd", "LLC", "Group", "Holdings", "University", "College",
    "Institute", "Foundation", "Association", "Society", "Church",
    "Bank", "Airlines", "Motors", "Systems", "Technologies", "Labs",
    "Laboratories", "Industries", "Partners", "Capital", "Media",
    "Times", "Post", "Herald", "Tribune", "Journal", "Council",
    "Committee", "Ministry", "Agency", "Authority", "Commission",
    // international legal suffixes — a real web crawl is full of them;
    // the hand-authored eval set (HandEval) first exposed the gap
    "AG", "GmbH", "NV", "N.V.", "BV", "B.V.", "SpA", "S.p.A.", "SA",
    "S.A.", "SAS", "SE", "Oy", "AB", "plc", "PLC", "Pty", "KK",
    "Cooperative", "Guild")

  val titles: Set[String] = Set(
    "president", "chairman", "chairwoman", "chief", "executive",
    "officer", "director", "manager", "engineer", "scientist",
    "professor", "researcher", "analyst", "economist", "journalist",
    "editor", "reporter", "author", "writer", "lawyer", "attorney",
    "judge", "senator", "governor", "mayor", "minister", "secretary",
    "ambassador", "general", "colonel", "captain", "spokesman",
    "spokeswoman", "founder", "cofounder", "co-founder", "consultant",
    "surgeon", "physician", "architect", "designer", "developer",
    "teacher", "principal", "dean", "chancellor", "treasurer", "coach")

  val religions: Set[String] = Set(
    "Christianity", "Christian", "Islam", "Muslim", "Judaism", "Jewish",
    "Buddhism", "Buddhist", "Hinduism", "Hindu", "Catholicism",
    "Catholic", "Protestant", "Sikhism", "Sikh")

  val ideologies: Set[String] = Set(
    "conservative", "liberal", "socialist", "communist", "libertarian",
    "progressive", "nationalist", "centrist", "populist")

  val criminalCharges: Set[String] = Set(
    "fraud", "murder", "bribery", "embezzlement", "conspiracy",
    "corruption", "theft", "assault", "perjury", "racketeering",
    "smuggling", "extortion", "manslaughter", "arson", "kidnapping")

  val causesOfDeath: Set[String] = Set(
    "cancer", "heart attack", "stroke", "pneumonia", "leukemia",
    "heart failure", "car accident", "plane crash", "overdose",
    "drowning", "suicide", "gunshot", "sepsis", "complications")

  /** Person pronouns (SlotMentionAnnotator pronoun retag,
   *  process/SlotMentionAnnotator.java:91-119). */
  val personPronouns: Set[String] = Set(
    "he", "she", "him", "her", "his", "hers", "He", "She", "Him", "Her",
    "His", "Hers")
  val orgPronouns: Set[String] = Set("it", "its", "It", "Its", "they",
    "They", "them", "their", "Their")

  /** relation -> trigger phrases between/near the arg spans
   *  (keywords_no_ml stand-in; drives pattern scoring + LR features). */
  val triggers: Map[String, Seq[String]] = Map(
    "per:title" -> Seq("is a", "is the", "works as", "serves as", "named"),
    "per:employee_of" -> Seq("works at", "works for", "employed by",
      "employee of", "joined", "hired by"),
    "per:member_of" -> Seq("member of", "belongs to", "sits on"),
    "per:schools_attended" -> Seq("graduated from", "studied at",
      "attended", "earned a degree from", "alumnus of"),
    "per:city_of_birth" -> Seq("was born in", "born in", "birthplace"),
    "per:stateorprovince_of_birth" -> Seq("was born in", "born in"),
    "per:country_of_birth" -> Seq("was born in", "born in"),
    "per:cities_of_residence" -> Seq("lives in", "resides in", "lived in",
      "resident of", "home in"),
    "per:stateorprovinces_of_residence" -> Seq("lives in", "resides in", "lived in"),
    "per:countries_of_residence" -> Seq("lives in", "resides in", "lived in"),
    "per:city_of_death" -> Seq("died in", "passed away in"),
    "per:stateorprovince_of_death" -> Seq("died in", "passed away in"),
    "per:country_of_death" -> Seq("died in", "passed away in"),
    "per:date_of_birth" -> Seq("was born on", "born on", "born"),
    "per:date_of_death" -> Seq("died on", "died", "passed away on"),
    "per:cause_of_death" -> Seq("died of", "died from", "succumbed to"),
    "per:age" -> Seq("aged", "age", "years old", ","),
    "per:spouse" -> Seq("married to", "married", "wife of", "husband of",
      "wife", "husband", "wed"),
    "per:children" -> Seq("father of", "mother of", "parent of", "son",
      "daughter", "children"),
    "per:parents" -> Seq("son of", "daughter of", "child of"),
    "per:siblings" -> Seq("brother of", "sister of", "brother", "sister"),
    "per:other_family" -> Seq("cousin of", "uncle of", "aunt of",
      "grandfather of", "grandmother of", "nephew of", "niece of"),
    "per:origin" -> Seq("citizen", "native", "descent", "origin"),
    "per:religion" -> Seq("practices", "converted to", "devout", "faith"),
    "per:charges" -> Seq("charged with", "convicted of", "accused of",
      "pleaded guilty to", "indicted for"),
    "per:alternate_names" -> Seq("also known as", "known as", "alias",
      "nicknamed", "born"),
    "org:top_members/employees" -> Seq("chief executive", "CEO of",
      "president of", "chairman of", "led by", "headed by", "head of",
      "director of"),
    "org:founded_by" -> Seq("founded by", "cofounded by", "co-founded by",
      "established by", "created by", "founder of", "started by",
      "founded"),
    "org:founded" -> Seq("founded in", "established in", "was founded",
      "formed in", "created in"),
    "org:dissolved" -> Seq("dissolved in", "shut down in", "closed in",
      "disbanded in"),
    "org:city_of_headquarters" -> Seq("headquartered in", "based in",
      "headquarters in"),
    "org:stateorprovince_of_headquarters" -> Seq("headquartered in", "based in"),
    "org:country_of_headquarters" -> Seq("headquartered in", "based in"),
    "org:number_of_employees/members" -> Seq("employs", "employees",
      "members", "staff of"),
    "org:subsidiaries" -> Seq("subsidiary", "unit of", "division of",
      "owns", "acquired"),
    "org:parents" -> Seq("parent company", "owned by", "unit of",
      "division of", "subsidiary of"),
    "org:members" -> Seq("member", "includes", "joined"),
    "org:member_of" -> Seq("member of", "joined", "part of"),
    "org:shareholders" -> Seq("shareholder", "stake in", "shares of",
      "investor in"),
    "org:political/religious_affiliation" -> Seq("affiliated with",
      "aligned with", "leaning"),
    "org:alternate_names" -> Seq("also known as", "known as", "formerly"),
    "org:website" -> Seq("website", "site", "online at", "visit"))

  /** S6 word clusters (process/FeatureFactory.java:65-78, the
   *  `word<TAB>cluster` egw4-reut.512.clusters format; the reference's
   *  blob is stripped from its checkout). The committed resource is a
   *  Brown-cluster-style file over ~1.5k common English words grouped by
   *  the classic Brown syntactico-semantic classes (function-word classes,
   *  months/days, titles, name classes, verb classes), so
   *  `between_cluster=`/`adjacent_clusters` features generalize across
   *  words of one class instead of memorizing surfaces. Dimension data:
   *  loaded once per JVM, closed over by the featurizer (broadcast-sized,
   *  never shuffled). */
  lazy val wordClusterFile: Map[String, String] =
    Option(getClass.getResourceAsStream("/graft/word_clusters.tsv"))
      .map { in =>
        val src = scala.io.Source.fromInputStream(in, "UTF-8")
        try src.getLines().filter(_.nonEmpty).map { l =>
          val t = l.split("\t", 2); t(0) -> t(1)
        }.toMap
        finally src.close()
      }.getOrElse(Map.empty)

  /** word -> cluster id: committed cluster file first; out-of-vocabulary
   *  words fall back to a stable hash bucket (the synthetic default that
   *  shipped before the file existed — keeps the feature total, never
   *  null). */
  def wordCluster(w: String): String = {
    val s = w.toLowerCase
    wordClusterFile.getOrElse(s, hashCluster(s))
  }

  private def hashCluster(s: String): String = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    "c" + java.lang.Long.toUnsignedString(((h % 512) + 512) % 512)
  }

  /** Month name -> 2-digit number (timex normalization). */
  val months: Map[String, String] = Map(
    "january" -> "01", "february" -> "02", "march" -> "03",
    "april" -> "04", "may" -> "05", "june" -> "06", "july" -> "07",
    "august" -> "08", "september" -> "09", "october" -> "10",
    "november" -> "11", "december" -> "12",
    "jan" -> "01", "feb" -> "02", "mar" -> "03", "apr" -> "04",
    "jun" -> "06", "jul" -> "07", "aug" -> "08", "sep" -> "09",
    "sept" -> "09", "oct" -> "10", "nov" -> "11", "dec" -> "12")
}
