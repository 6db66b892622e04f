package graft

import org.scalatest.funsuite.AnyFunSuite

class MainSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("parse: full arg vector and the two failure modes") {
    val o = Main.parse(List("--synthetic", "80", "--tables", "/t",
      "--out", "/o", "--run-id", "r7", "--dedup"))
    assert(o == Main.Opts(None, Some(80), Some("/t"), Some("/o"), "r7",
      dedup = true))
    assertThrows[IllegalArgumentException](Main.parse(List("--bogus", "x")))
    // neither --pages nor --synthetic: the source resolver refuses
    assertThrows[IllegalArgumentException](
      Main.pagesOf(spark, Main.Opts()))
    // both given: also refused (ambiguous input)
    assertThrows[IllegalArgumentException](
      Main.pagesOf(spark, Main.Opts(pages = Some("/p"), synthetic = Some(1))))
  }

  test("pagesOf: reads an input_hint parquet table, pruning extra columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-main-p").toString
    val (pages, _) = graft.fixtures.PageGen.corpus(12)
    // a production crawl table is wider than the input_hint five — the
    // reader's explicit select must prune, not choke
    spark.createDataset(pages).toDF()
      .withColumn("crawl_batch", org.apache.spark.sql.functions.lit("b-1"))
      .write.mode("overwrite").parquet(dir)
    val back = Main.pagesOf(spark, Main.Opts(pages = Some(dir))).collect()
    assert(back.map(p => (p.url, p.text)).toSet ==
      pages.map(p => (p.url, p.text)).toSet)
  }

  test("runJob: synthetic corpus -> pred-partitioned export, resumable tables") {
    val tables = java.nio.file.Files.createTempDirectory("graft-main-t").toString
    val out = java.nio.file.Files.createTempDirectory("graft-main-o").toString
    val opts = Main.Opts(synthetic = Some(80), tables = Some(tables),
      out = Some(out), runId = "main-spec")
    val first = Main.runJob(spark, opts).collect()
    assert(first.nonEmpty)

    // the export is a pred-partitioned parquet table readable back to the
    // same triple set
    val preds = new java.io.File(out).list().filter(_.startsWith("pred="))
    assert(preds.nonEmpty)
    val reread = spark.read.parquet(out)
      .select("subj", "pred", "obj").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(reread ==
      first.map(t => (t.subj, t.pred, t.obj)).toSet)

    // second invocation resumes from the snapshot root: identical triples
    val resumed = Main.runJob(spark, opts.copy(runId = "main-spec-2")).collect()
    assert(resumed.map(t => (t.subj, t.pred, t.obj, t.score)).toSet ==
      first.map(t => (t.subj, t.pred, t.obj, t.score)).toSet)
  }
}
