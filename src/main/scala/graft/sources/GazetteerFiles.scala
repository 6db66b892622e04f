package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * S5/S6 file scans — the reference's gazetteer and word-cluster FILE
 * formats, loadable in place of the in-code dictionaries
 * (nlp.Gazetteers is the default data; these readers are the production
 * path for swapping in full-size public files):
 *
 *  - kbp_cities.tab / kbp_regions.tab / kbp_countries.tab:
 *    `name<TAB>regioncode<TAB>countrycode<TAB>population`
 *    (loader evaluate/WorldKnowledgePostProcessor.java:120-220)
 *  - egw4-reut.512.clusters-style word clusters: `word<TAB>cluster`
 *    (process/FeatureFactory.java:65-78; the blob itself is stripped
 *    from the reference checkout — /root/reference/.MISSING_LARGE_BLOBS)
 *  - common_names.txt: one first name per line
 *    (ir/PostIRAnnotator.java:77-93)
 *
 * All are dimension data: read once, collected, broadcast — never
 * shuffled (SURVEY.md §2.1).
 */
object GazetteerFiles {

  /** city -> (regioncode, countrycode) from a kbp_cities.tab-format file;
   *  codes are resolved to names by the caller via the regions/countries
   *  tables when present. */
  def cities(spark: SparkSession, path: String): Map[String, (String, String)] =
    spark.read.option("sep", "\t").csv(path).collect().iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1) && !r.isNullAt(2))
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2)))
      .toMap

  /** code -> name (kbp_regions.tab / kbp_countries.tab: name first,
   *  code second in the reference loader's reverse maps). */
  def codeToName(spark: SparkSession, path: String): Map[String, String] =
    spark.read.option("sep", "\t").csv(path).collect().iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(1) -> r.getString(0))
      .toMap

  /** word -> cluster id (S6). */
  def wordClusters(spark: SparkSession, path: String): Map[String, String] =
    spark.read.option("sep", "\t").csv(path).collect().iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(0) -> r.getString(1))
      .toMap

  /** S9 common first names, one per line. */
  def commonNames(spark: SparkSession, path: String): Set[String] =
    spark.read.text(path).collect().iterator
      .map(_.getString(0).trim).filter(_.nonEmpty).toSet

  /** Resolve a cities table's codes to display names, mirroring the
   *  reference's city2region/code2country composition. */
  def resolvedCities(cities: Map[String, (String, String)],
                     regions: Map[String, String],
                     countries: Map[String, String])
      : Map[String, (String, String)] =
    cities.map { case (city, (rc, cc)) =>
      city -> (regions.getOrElse(rc, rc), countries.getOrElse(cc, cc))
    }
}
