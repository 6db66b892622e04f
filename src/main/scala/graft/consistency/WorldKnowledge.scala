package graft.consistency

import graft.nlp.Gazetteers

/**
 * X12 world-knowledge geo suite — the region-containment hierarchy of the
 * reference's evaluate/WorldKnowledgePostProcessor.java:
 *  - loader tables (:29-233): city -> region SET (one city name, many
 *    regions), population-weighted primary region, region -> country,
 *    (countryCode, regionCode) -> region, country codes, alternate country
 *    names, city abbreviations
 *  - canonicalizers (:266-299): city/region/country surface -> canonical
 *    key (abbreviation + code + alternate-name resolution)
 *  - consistency checks (:301-349): city-region, city-country,
 *    region-country containment
 *  - entailment (:515-561 geoEntailments): city -> its primary region and
 *    country (population-weighted), nationality <-> country
 *
 * One DELIBERATE deviation: a gazetteer MISS passes every check (the
 * reference returns false for unknown cities, killing the paired fill).
 * At web scale the gazetteer covers a vanishing fraction of real places —
 * failing open is recall-safe; failing closed deletes correct fills for
 * every city outside the dictionary. Checks therefore only fire when BOTH
 * values are known and positively contradictory.
 *
 * All tables are tiny dimension data: broadcast with the task closure,
 * never shuffled. `fromRows` rebuilds the same structure from
 * kbp_cities.tab-format files via sources.GazetteerFiles for production
 * swaps.
 */
class WorldKnowledge(rows: Seq[WorldKnowledge.CityRow],
                     extraRegionCountry: Map[String, String],
                     val code2country: Map[String, String],
                     val code2region: Map[(String, String), String],
                     val abbrv2city: Map[String, String],
                     val alternateName2country: Map[String, String]) {
  import WorldKnowledge.lc

  /** canonical (lowercase) city -> the regions a city of that name is in */
  val city2regions: Map[String, Set[String]] =
    rows.groupBy(r => lc(r.city))
      .map { case (c, rs) => c -> rs.map(r => lc(r.region)).toSet }

  /** canonical city -> primary (most-populous) region, display case */
  val city2primaryRegion: Map[String, String] =
    rows.groupBy(r => lc(r.city))
      .map { case (c, rs) => c -> rs.maxBy(r => (r.population, r.region)).region }

  /** canonical region -> canonical countries containing it (singleton in a
   *  clean gazetteer; a set so a collided region name never lies) */
  val region2countries: Map[String, Set[String]] =
    (rows.map(r => lc(r.region) -> lc(r.country)) ++
      extraRegionCountry.map { case (k, v) => lc(k) -> lc(v) })
      .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).toSet }

  /** canonical region -> display form */
  val regionDisplay: Map[String, String] =
    (rows.map(r => lc(r.region) -> r.region) ++
      extraRegionCountry.keys.map(k => lc(k) -> k)).toMap

  /** canonical country -> display form */
  val countryDisplay: Map[String, String] =
    (rows.map(r => lc(r.country) -> r.country) ++
      extraRegionCountry.values.map(v => lc(v) -> v) ++
      code2country.values.map(v => lc(v) -> v)).toMap

  val countries: Set[String] = countryDisplay.keySet

  // ---- canonicalizers (ref :266-299) ----

  def canonicalizeCity(city: String): String = {
    val n = lc(city)
    if (city2regions.contains(n)) n
    else abbrv2city.get(city.trim.replaceAll("\\.", "").toUpperCase)
      .map(lc).getOrElse(n)
  }

  def canonicalizeRegion(region: String,
                         countryCode: Option[String] = None): String = {
    val n = lc(region)
    if (region2countries.contains(n)) n
    else {
      val code = region.trim.replaceAll("\\.", "").toUpperCase
      val tryCodes = countryCode.map(_.toUpperCase).toSeq ++ Seq("US", "CA")
      tryCodes.iterator.flatMap(cc => code2region.get((cc, code)))
        .map(lc).nextOption().getOrElse(n)
    }
  }

  def canonicalizeCountry(country: String): String = {
    val n = lc(country)
    if (countries.contains(n)) n
    else alternateName2country.get(country.trim)
      .orElse(alternateName2country.get(n))
      .orElse(code2country.get(country.trim.replaceAll("\\.", "").toUpperCase)
        .filter(_ => country.trim.replaceAll("\\.", "").length <= 3))
      .map(lc).getOrElse(n)
  }

  // ---- validity ----

  def isValidCity(city: String): Boolean =
    city2regions.contains(canonicalizeCity(city))
  def isValidRegion(region: String): Boolean =
    region2countries.contains(canonicalizeRegion(region))
  def isValidCountry(country: String): Boolean =
    countries.contains(canonicalizeCountry(country))

  // ---- containment checks (ref :320-349; fail-open on gazetteer miss) ----

  def consistentCityRegion(city: String, region: String): Boolean = {
    val r = canonicalizeRegion(region)
    city2regions.get(canonicalizeCity(city)) match {
      case Some(rs) if region2countries.contains(r) =>
        rs.contains(r) ||
          // "Washington" the region is an acceptable container for a city
          // whose region is the District of Columbia (ref :324)
          (r == "washington" && rs.contains("district of columbia"))
      case _ => true
    }
  }

  def consistentCityCountry(city: String, country: String): Boolean = {
    val y = canonicalizeCountry(country)
    city2regions.get(canonicalizeCity(city)) match {
      case Some(rs) if countries.contains(y) =>
        rs.exists(r => region2countries.getOrElse(r, Set.empty).contains(y))
      case _ => true
    }
  }

  def consistentRegionCountry(region: String, country: String): Boolean = {
    val r = canonicalizeRegion(region)
    val y = canonicalizeCountry(country)
    region2countries.get(r) match {
      case Some(cs) if countries.contains(y) => cs.contains(y)
      case _ => true
    }
  }

  // ---- entailment (ref :355-372, :515-561; population-weighted) ----

  def regionForCity(city: String): Option[String] =
    city2primaryRegion.get(canonicalizeCity(city))

  def countryForRegion(region: String): Option[String] =
    region2countries.get(canonicalizeRegion(region))
      .filter(_.size == 1).map(cs => countryDisplay(cs.head))

  def countryForCity(city: String): Option[String] =
    regionForCity(city).flatMap(countryForRegion)

  // ---- display renames (the canonical-rename half of X12) ----

  /** Region CODE -> display region ("CA" -> "California"); None when the
   *  value is already canonical or not a known code. */
  def regionCodeRename(obj: String): Option[String] = {
    val n = lc(obj)
    if (region2countries.contains(n)) None
    else {
      val canon = canonicalizeRegion(obj)
      if (canon != n) regionDisplay.get(canon) else None
    }
  }

  /** Alternate country surface -> display country ("U.K." -> "United
   *  Kingdom"); None when already canonical or unknown. */
  def countryRename(obj: String): Option[String] = {
    val n = lc(obj)
    if (countries.contains(n)) countryDisplay.get(n).filter(_ != obj)
    else {
      val canon = canonicalizeCountry(obj)
      if (canon != n) countryDisplay.get(canon) else None
    }
  }

  /** City abbreviation -> display city ("NYC" -> "New York"). */
  def cityAbbrevRename(obj: String): Option[String] = {
    val n = lc(obj)
    if (city2regions.contains(n)) None
    else abbrv2city.get(obj.trim.replaceAll("\\.", "").toUpperCase)
  }
}

object WorldKnowledge {

  /** kbp_cities.tab row shape: name, region, country, population. */
  final case class CityRow(city: String, region: String, country: String,
                           population: Int)

  private def lc(s: String) = s.trim.toLowerCase

  /** In-code default tables (public geographic knowledge; stand-ins for the
   *  reference's kbp_*.tab files — swap via fromRows + GazetteerFiles). */
  val default: WorldKnowledge = {
    val base = Gazetteers.cities.toSeq.map { case (c, (r, co)) =>
      CityRow(c, r, co, 100000)
    }
    // ambiguous city names — the containment cases a flat city->(region,
    // country) map cannot represent (ref city2region is a SET for this)
    val ambiguous = Seq(
      CityRow("Cambridge", "England", "United Kingdom", 145700),
      CityRow("Cambridge", "Massachusetts", "United States", 118400),
      CityRow("Portland", "Oregon", "United States", 650000),
      CityRow("Portland", "Maine", "United States", 68000),
      CityRow("Vancouver", "British Columbia", "Canada", 662000),
      CityRow("Vancouver", "Washington", "United States", 190000),
      CityRow("Springfield", "Massachusetts", "United States", 155000),
      CityRow("Springfield", "Illinois", "United States", 114000),
      CityRow("Washington", "District of Columbia", "United States", 689000))
    val extraRegions = Map(
      "Arizona" -> "United States", "Nevada" -> "United States",
      "Utah" -> "United States", "Ohio" -> "United States",
      "Virginia" -> "United States", "Maryland" -> "United States",
      "New Jersey" -> "United States", "Connecticut" -> "United States",
      "Minnesota" -> "United States", "Wisconsin" -> "United States",
      "Missouri" -> "United States", "Tennessee" -> "United States",
      "Alabama" -> "United States", "Louisiana" -> "United States",
      "Oklahoma" -> "United States", "Kansas" -> "United States",
      "Iowa" -> "United States")
    val code2country = Map(
      "US" -> "United States", "USA" -> "United States",
      "CA" -> "Canada", "UK" -> "United Kingdom", "GB" -> "United Kingdom",
      "FR" -> "France", "DE" -> "Germany", "ES" -> "Spain", "IT" -> "Italy",
      "NL" -> "Netherlands", "BE" -> "Belgium", "CH" -> "Switzerland",
      "AT" -> "Austria", "SE" -> "Sweden", "NO" -> "Norway",
      "DK" -> "Denmark", "FI" -> "Finland", "IE" -> "Ireland",
      "PT" -> "Portugal", "PL" -> "Poland", "CZ" -> "Czech Republic",
      "HU" -> "Hungary", "GR" -> "Greece", "RU" -> "Russia",
      "JP" -> "Japan", "CN" -> "China", "KR" -> "South Korea",
      "IN" -> "India", "AU" -> "Australia", "NZ" -> "New Zealand",
      "BR" -> "Brazil", "AR" -> "Argentina", "MX" -> "Mexico",
      "EG" -> "Egypt", "NG" -> "Nigeria", "KE" -> "Kenya",
      "ZA" -> "South Africa", "IL" -> "Israel", "TR" -> "Turkey",
      "AE" -> "United Arab Emirates", "SG" -> "Singapore")
    // (countryCode, regionCode) -> region: US postal + Canadian provinces
    val usStates = Map(
      "AL" -> "Alabama", "AZ" -> "Arizona", "CA" -> "California",
      "CO" -> "Colorado", "CT" -> "Connecticut",
      "DC" -> "District of Columbia", "FL" -> "Florida", "GA" -> "Georgia",
      "IA" -> "Iowa", "IL" -> "Illinois", "KS" -> "Kansas",
      "LA" -> "Louisiana", "MA" -> "Massachusetts", "MD" -> "Maryland",
      "ME" -> "Maine", "MI" -> "Michigan", "MN" -> "Minnesota",
      "MO" -> "Missouri", "NJ" -> "New Jersey", "NV" -> "Nevada",
      "NY" -> "New York", "OH" -> "Ohio", "OK" -> "Oklahoma",
      "OR" -> "Oregon", "PA" -> "Pennsylvania", "TN" -> "Tennessee",
      "TX" -> "Texas", "UT" -> "Utah", "VA" -> "Virginia",
      "WA" -> "Washington", "WI" -> "Wisconsin")
    val caProvinces = Map(
      "ON" -> "Ontario", "BC" -> "British Columbia", "QC" -> "Quebec")
    val code2region =
      usStates.map { case (k, v) => ("US", k) -> v } ++
        caProvinces.map { case (k, v) => ("CA", k) -> v }
    val abbrv2city = Map(
      "NYC" -> "New York", "LA" -> "Los Angeles", "SF" -> "San Francisco",
      "DC" -> "Washington")
    val altCountry = Map(
      "U.S." -> "United States", "USA" -> "United States",
      "U.S.A." -> "United States", "America" -> "United States",
      "the United States" -> "United States",
      "U.K." -> "United Kingdom", "UK" -> "United Kingdom",
      "Britain" -> "United Kingdom", "Great Britain" -> "United Kingdom",
      "Holland" -> "Netherlands", "the Netherlands" -> "Netherlands")
    new WorldKnowledge(base ++ ambiguous, extraRegions, code2country,
      code2region, abbrv2city, altCountry)
  }

  /** Production constructor from kbp_*.tab-format tables (read via
   *  sources.GazetteerFiles): resolve codes, then build the same structure. */
  def fromRows(cities: Seq[CityRow],
               extraRegionCountry: Map[String, String] = Map.empty,
               code2country: Map[String, String] = Map.empty,
               code2region: Map[(String, String), String] = Map.empty,
               abbrv2city: Map[String, String] = Map.empty,
               alternateName2country: Map[String, String] = Map.empty)
      : WorldKnowledge =
    new WorldKnowledge(cities, extraRegionCountry, code2country, code2region,
      abbrv2city, alternateName2country)
}
