package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.PageGen
import graft.pipeline.KGPipeline
import graft.evaluate.QueryEval
import graft.sources.Readers

/** The reference's flagship loop, end-to-end: query XML -> per-entity slot
 *  fills (X3 ignores applied) -> official output with NIL rows -> gold
 *  P/R (KBPEvaluator.java:116-155, OfficialOutputWriter.java:46-107). */
class QueryEvalSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val N = 40
  private lazy val (pages, gold) = PageGen.corpus(N)
  private lazy val triples = KGPipeline.run(spark, spark.createDataset(pages))

  private lazy val fixtureDir =
    java.nio.file.Files.createTempDirectory("graft-queries")

  // SF001 ignores per:title; SF002 is the same entity without ignores
  private lazy val queryXmlPath = {
    val p = PageGen.person(0)
    val xml =
      s"""<?xml version="1.0"?>
         |<kbpslotfill>
         |  <query id="SF001">
         |    <name>$p</name><docid>doc0</docid><enttype>PER</enttype>
         |    <nodeid>E1</nodeid><ignore>per:title</ignore>
         |  </query>
         |  <query id="SF002">
         |    <name>$p</name><docid>doc0</docid><enttype>PER</enttype>
         |    <nodeid>E2</nodeid>
         |  </query>
         |</kbpslotfill>""".stripMargin
    val path = fixtureDir.resolve("sample_test.xml")
    java.nio.file.Files.writeString(path, xml)
    path.toString
  }

  private lazy val official = QueryEval.run(spark, triples,
    Readers.queryXml(spark, queryXmlPath)).collect()

  test("official output emits NIL rows for unfilled relations") {
    val nils = official.filter(r => r.getString(4) == "NIL")
    assert(nils.nonEmpty, "no NIL rows emitted")
    // every queried (query, official relation) appears at least once
    val perPreds = graft.model.Relations.all.filter(_.entityType == "PERSON")
      .map(m => graft.model.Relations.officialName(m.name)).distinct
    val sf1Preds = official.filter(_.getString(0) == "SF001")
      .map(_.getString(1)).distinct
    assert(perPreds.toSet == sf1Preds.toSet,
      s"missing relations: ${perPreds.toSet -- sf1Preds.toSet}")
  }

  test("X3: the query's <ignore> list is applied") {
    // SF001 ignores per:title -> only a NIL row; SF002 keeps its fill
    val sf1Title = official.filter(r =>
      r.getString(0) == "SF001" && r.getString(1) == "per:title")
    assert(sf1Title.forall(_.getString(4) == "NIL"), "ignored slot leaked")
    val sf2Title = official.filter(r =>
      r.getString(0) == "SF002" && r.getString(1) == "per:title")
    assert(sf2Title.exists(_.getString(4) != "NIL"),
      "un-ignored slot missing")
  }

  test("gold P/R = 1.0 through the official output (SF002)") {
    val p = PageGen.person(0)
    // gold key TSV (11 cols; 1=queryId, 3=relation, 8=slot, 10=judgement)
    val lines = gold.toSeq.filter(_.subj == p).map(g =>
      s"x\tSF002\tx\t${g.pred}\tx\tx\tx\tx\t${g.obj}\tx\t1")
    val goldPath = fixtureDir.resolve("gold_key.tsv")
    java.nio.file.Files.writeString(goldPath, lines.mkString("\n"))
    val goldDf = Readers.goldKey(spark, goldPath.toString)
    val officialDf = QueryEval.run(spark, triples,
      Readers.queryXml(spark, queryXmlPath))
      .filter(col("query_id") === "SF002")
    val prf = QueryEval.prfVsGold(spark, officialDf, goldDf).collect()(0)
    assert(prf.getAs[Double]("precision") == 1.0 &&
      prf.getAs[Double]("recall") == 1.0,
      s"P/R through the query loop: $prf")
  }

  test("X6: already-known KB slots are filtered (exact + containment)") {
    import spark.implicits._
    val fills = Seq(
      ("Acme Corp", "ORGANIZATION", "org:founded_by", "John Smith", "d", 0),
      ("Acme Corp", "ORGANIZATION", "org:subsidiaries", "Beta LLC", "d", 0))
      .toDF("subj", "subj_type", "pred", "obj", "prov_doc_id",
        "prov_sent_idx")
    val kb = Seq(("Acme Corp", "org:founded_by", "John Smith"))
      .toDF("subj", "pred", "obj")
    val out = QueryEval.filterAlreadyKnown(spark, fills, kb)
      .select("pred").as[String].collect().toSet
    assert(out == Set("org:subsidiaries"), s"X6 failed: $out")
    // containment also kills ("John Smith" ~ "Mr John Smith Jr")
    assert(QueryEval.contained("John Smith", "mr john smith jr"))
    assert(!QueryEval.contained("John Smith", "john q smith"))
  }

  test("X6: alternate name equal to the pivot dies") {
    import spark.implicits._
    val fills = Seq(
      ("Acme Corp", "ORGANIZATION", "org:alternate_names", "acme corp", "d", 0),
      ("John Smith", "PERSON", "per:alternate_names", "Smith", "d", 0),
      ("John Smith", "PERSON", "per:alternate_names", "Johnny Walker", "d", 0))
      .toDF("subj", "subj_type", "pred", "obj", "prov_doc_id",
        "prov_sent_idx")
    val kb = Seq.empty[(String, String, String)].toDF("subj", "pred", "obj")
    val out = QueryEval.filterAlreadyKnown(spark, fills, kb)
      .select("obj").as[String].collect().toSet
    assert(out == Set("Johnny Walker"), s"alt-name filter failed: $out")
  }
}
