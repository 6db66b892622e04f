package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Source readers for the reference's input formats (SURVEY.md §2.1):
 *  - S1 candidate-sentence TSV (evaluate/SimpleSlotFiller.java:105-152)
 *  - S2 query XML (spec/TaskXMLParser.java:25-117)
 *  - S3 gold key TSV, 11 columns (classify/GoldClassifier.java:68-111)
 *  - S4 KB tuples TSV (ir/KBPIR.java:141-194)
 * Small dimension inputs: S2 parses driver-side (files are KBs), the TSVs
 * go through spark.read.csv so they scale if they don't stay small.
 */
object Readers {

  final case class QueryEntity(query_id: String, name: String,
                               ent_type: String, doc_id: String,
                               ignored_preds: Seq[String])

  /** S1: fields 0=queryId, 1=relation, 3=provenance, 8=sentence text. */
  def candidateSentences(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .select(col("_c0").as("query_id"), col("_c1").as("relation"),
        col("_c3").as("provenance"), col("_c8").as("sentence"))

  /** S2: SAX-free tiny-XML parse of <kbpslotfill><query id=...> blocks. */
  def queryXml(spark: SparkSession, path: String): Dataset[QueryEntity] = {
    import spark.implicits._
    val xml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8")
    val qBlock = "(?s)<query id=\"([^\"]+)\">(.*?)</query>".r
    def field(block: String, tag: String): String =
      s"(?s)<$tag>(.*?)</$tag>".r.findFirstMatchIn(block)
        .map(_.group(1).trim).getOrElse("")
    val rows = qBlock.findAllMatchIn(xml).map { m =>
      val b = m.group(2)
      QueryEntity(m.group(1), field(b, "name"),
        field(b, "enttype").toUpperCase match {
          case "PER" => "PERSON"; case "ORG" => "ORGANIZATION"; case other => other
        },
        field(b, "docid"),
        s"(?s)<ignore>(.*?)</ignore>".r.findFirstMatchIn(b)
          .map(_.group(1).trim.split("\\s+").toSeq).getOrElse(Nil))
    }.toSeq
    spark.createDataset(rows)
  }

  /** S3: gold key TSV — col 1=queryId, 3=relation, 8=slotValue,
   *  10=judgement (-1,1,2,3; CORRECT=1 — CustomSFScore.java:37-40). */
  def goldKey(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .select(col("_c1").as("query_id"), col("_c3").as("relation"),
        col("_c8").as("slot_value"), col("_c10").cast("int").as("judgement"))
      .withColumn("correct", col("judgement") === 1)

  /** S4: distant-supervision KB triples TSV (entity, relation, slot). */
  def kbTuples(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").csv(path)
      .select(col("_c0").as("subj"), col("_c1").as("pred"),
        col("_c2").as("obj"))
}
