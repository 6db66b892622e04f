package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.PageGen
import graft.streaming.StreamIngest

class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("streaming ingest + batch compaction equals the batch pipeline") {
    val n = 30
    val (pages, _) = PageGen.corpus(n)
    val root = java.nio.file.Files.createTempDirectory("graft-stream").toString

    // drive the file-based stream with two micro-batches of parquet input
    val inDir = s"$root/in"
    spark.createDataset(pages.take(n / 2)).write.mode("append").parquet(inDir)
    val stream = spark.readStream
      .schema(spark.createDataset(pages).schema)
      .parquet(inDir).as[graft.model.Page]
    val q1 = StreamIngest.start(spark, stream, root)
    q1.awaitTermination()
    spark.createDataset(pages.drop(n / 2)).write.mode("append").parquet(inDir)
    val q2 = StreamIngest.start(spark, stream, root)
    q2.awaitTermination()

    val streamed = StreamIngest.compact(spark, root).collect()
      .map(t => (t.subj, t.pred, t.obj)).toSet
    val batch = graft.pipeline.KGPipeline.run(spark,
      spark.createDataset(pages)).collect()
      .map(t => (t.subj, t.pred, t.obj)).toSet
    assert(streamed == batch)
  }

  test("watermarked recrawl dedup keeps one page per distinct content") {
    val root = java.nio.file.Files.createTempDirectory("graft-dedup").toString
    val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def page(url: String, text: String) =
      graft.model.Page(url, ts, Array.emptyByteArray, text, "en")
    // 3 distinct contents across 5 fetches (mirror URLs / recrawls)
    val pages = Seq(
      page("http://a/1", "alpha body"), page("http://a/1b", "alpha body"),
      page("http://b/2", "beta body"), page("http://b/2b", "beta body"),
      page("http://c/3", "gamma body"))
    val inDir = s"$root/in"
    spark.createDataset(pages).write.mode("append").parquet(inDir)
    val stream = spark.readStream
      .schema(spark.createDataset(pages).schema)
      .parquet(inDir).as[graft.model.Page]
    val q = StreamIngest.dedupPagesStream(stream).writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$root/_ck")
      .format("parquet").option("path", s"$root/out").start()
    q.awaitTermination()
    val out = spark.read.parquet(s"$root/out").as[graft.model.Page].collect()
    assert(out.length == 3, s"expected 3 deduped pages, got ${out.length}")
    assert(out.map(_.text).toSet ==
      Set("alpha body", "beta body", "gamma body"))
  }

  test("recrawl loop: per-snapshot incremental builds equal batch runs") {
    import graft.pipeline.KGPipeline
    val root = java.nio.file.Files.createTempDirectory("graft-recrawl").toString
    val (pages, _) = PageGen.corpus(80)
    val snap1 = pages.take(60) // crawl 1: urls 0..59
    // crawl 2: 0..19 deleted, 30..34 changed (donor text, same url),
    // 60..79 new -> the increment must redo exactly 25 urls
    val snap2 = (20 until 80).map { i =>
      if (i >= 30 && i <= 34)
        PageGen.page(i + 500)._1.copy(url = PageGen.page(i)._1.url)
      else PageGen.page(i)._1
    }
    val inDir = s"$root/in"
    // one parquet FILE per snapshot + maxFilesPerTrigger=1 => one
    // micro-batch per snapshot (the loop's input contract); the sleep
    // keeps the mtimes ordered for the file source
    spark.createDataset(snap1).repartition(1).write.mode("append").parquet(inDir)
    Thread.sleep(1000)
    spark.createDataset(snap2).repartition(1).write.mode("append").parquet(inDir)
    val stream = spark.readStream
      .schema(spark.createDataset(snap1).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir).as[graft.model.Page]
    // a stray NON-NUMERIC state dir carrying a _COMMITTED marker (a
    // crashed tool, an editor backup) must be ignored by carry-forward
    // discovery, not NumberFormatException the whole batch
    val junk = new java.io.File(s"$root/state/_stray_tool_dir")
    junk.mkdirs()
    new java.io.File(junk, "_COMMITTED").createNewFile()
    val q = StreamIngest.recrawlLoop(spark, stream, root)
    q.awaitTermination()
    assert(StreamIngest.lastRedoCount(root).contains(25L),
      s"redo=${StreamIngest.lastRedoCount(root)}")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("subj"), r.getAs[String]("pred"),
        r.getAs[String]("obj"))
    val t0 = spark.read.parquet(s"$root/state/0/triples").collect()
      .map(key).toSet
    val t1 = spark.read.parquet(s"$root/state/1/triples").collect()
      .map(key).toSet
    val b1 = KGPipeline.run(spark, spark.createDataset(snap1)).collect()
      .map(t => (t.subj, t.pred, t.obj)).toSet
    val b2 = KGPipeline.run(spark, spark.createDataset(snap2)).collect()
      .map(t => (t.subj, t.pred, t.obj)).toSet
    assert(t0 == b1)
    assert(t1 == b2)
    // the published changelog agrees with a from-scratch diff
    val delta = spark.read.parquet(s"$root/state/1/delta")
    val statuses = delta.collect()
      .map(r => key(r) -> r.getAs[String]("status")).toMap
    assert(statuses.keySet == (t0 ++ t1))
    assert(statuses.count(_._2 == "removed") == (t0 -- t1).size)
    assert(statuses.count(_._2 == "added") == (t1 -- t0).size)
    assert((t0 -- t1).forall(k => statuses(k) == "removed"))
    assert((t1 -- t0).forall(k => statuses(k) == "added"))
  }

  test("watermarked windowed crawl-rate emits final per-window counts") {
    val root = java.nio.file.Files.createTempDirectory("graft-rate").toString
    def page(url: String, ts: String, text: String, lang: String) =
      graft.model.Page(url, java.sql.Timestamp.valueOf(ts),
        Array.emptyByteArray, text, lang)
    val b1 = Seq(
      page("http://a/1", "2026-01-01 00:10:00", "aa", "en"),
      page("http://a/2", "2026-01-01 00:20:00", "bbbb", "en"),
      page("http://a/3", "2026-01-01 00:40:00", "cc", "de"),
      page("http://a/4", "2026-01-01 01:10:00", "ddd", "en"))
    // later batches advance the watermark so hours 0 and 1 finalize;
    // the 02:30 page's own window stays open (append mode holds it)
    val b2 = Seq(page("http://a/5", "2026-01-01 02:30:00", "e", "en"),
      page("http://a/6", "2026-01-01 03:30:00", "f", "en"))
    val b3 = Seq(page("http://a/7", "2026-01-01 10:00:00", "g", "en"))
    val inDir = s"$root/in"
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(spark.createDataset(b1).schema)
        .parquet(inDir).as[graft.model.Page]
      val q = StreamIngest.crawlRateStream(stream).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ck")
        .format("parquet").option("path", s"$root/out").start()
      q.awaitTermination()
    }
    Seq(b1, b2, b3).foreach { b =>
      spark.createDataset(b).write.mode("append").parquet(inDir)
      drain()
    }
    val out = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    // exactly the closed windows, with final counts: the trailing no-data
    // micro-batch finalizes every window behind the advanced watermark
    // (09:00), so hours 0-3 emit once each; the 10:00 page's own window
    // is still open and withheld — append mode never emits partials
    assert(out == Set(
      ("2026-01-01 00:00:00.0", "en", 2L, 6L),
      ("2026-01-01 00:00:00.0", "de", 1L, 2L),
      ("2026-01-01 01:00:00.0", "en", 1L, 3L),
      ("2026-01-01 02:00:00.0", "en", 1L, 1L),
      ("2026-01-01 03:00:00.0", "en", 1L, 1L)))
  }

  test("streaming session_window equals batch sessionize on closed sessions") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val b1 = Seq((1L, 10L, ts("2026-01-01 00:00:00")),
      (1L, 11L, ts("2026-01-01 00:10:00")),
      (2L, 20L, ts("2026-01-01 00:05:00")))
    val b2 = Seq((1L, 12L, ts("2026-01-01 01:00:00")), // 50 min: new session
      (1L, 13L, ts("2026-01-01 01:05:00")))
    // far-future singleton advances the watermark to 09:00 so every
    // earlier session closes; its own session stays open (append mode)
    val b3 = Seq((9L, 90L, ts("2026-01-01 10:00:00")))
    val inDir = s"$root/in"
    val schema = b1.toDF("user_id", "event_id", "ts").schema
    def drain(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(inDir)
      val q = StreamIngest.sessionStream(stream).writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ck")
        .format("parquet").option("path", s"$root/out").start()
      q.awaitTermination()
    }
    Seq(b1, b2, b3).foreach { b =>
      b.toDF("user_id", "event_id", "ts").write.mode("append").parquet(inDir)
      drain()
    }
    val streamed = spark.read.parquet(s"$root/out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    // the batch pass over the same closed events produces the same
    // (user, start, end, n) rows
    val batch = graft.ops.Sessions.sessionize(
        (b1 ++ b2).toDF("user_id", "event_id", "ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3),
        r.getLong(4))).toSet
    assert(streamed == batch)
    assert(streamed == Set(
      (1L, ts("2026-01-01 00:00:00"), ts("2026-01-01 00:10:00"), 2L),
      (1L, ts("2026-01-01 01:00:00"), ts("2026-01-01 01:05:00"), 2L),
      (2L, ts("2026-01-01 00:05:00"), ts("2026-01-01 00:05:00"), 1L)))
  }

  test("incremental noisy-or state equals the batch combinator") {
    import graft.model.{Provenance, SlotFill}
    val root = java.nio.file.Files.createTempDirectory("graft-noisyor").toString
    def fill(subj: String, obj: String, score: Double, doc: String) =
      SlotFill(subj, "PERSON", "per:title", obj, "TITLE", score,
        Provenance(doc, s"http://$doc", 0, 0, 1, 2, 3))
    val batch1 = Seq(fill("s1", "ceo", 0.6, "d1"), fill("s1", "ceo", 0.5, "d2"),
      fill("s2", "cfo", 0.9, "d3"))
    val batch2 = Seq(fill("s1", "ceo", 0.8, "d4"), fill("s3", "coo", 0.4, "d5"))
    val inDir = s"$root/in"
    val updates = scala.collection.mutable.ArrayBuffer
      .empty[StreamIngest.TripleUpdate]
    def drain(): Unit = {
      val stream = spark.readStream
        .schema(spark.createDataset(batch1).schema)
        .parquet(inDir).as[SlotFill]
      val q = StreamIngest.noisyOrStream(stream).writeStream
        .outputMode("update")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", s"$root/_ck")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[StreamIngest.TripleUpdate], _: Long) =>
          updates.synchronized { updates ++= df.collect() }
          ()
        }.start()
      q.awaitTermination()
    }
    spark.createDataset(batch1).write.mode("append").parquet(inDir)
    drain()
    spark.createDataset(batch2).write.mode("append").parquet(inDir)
    drain()
    // the LAST update per key is the final streaming state
    val last = updates.zipWithIndex
      .groupBy { case (u, _) => (u.subj, u.pred, u.obj) }
      .map { case (k, us) => k -> us.maxBy(_._2)._1 }
    // s1 got fills in both micro-batches -> two updates, monotone n_prov
    assert(last(("s1", "per:title", "ceo")).n_prov == 3L)
    // batch combinator over ALL fills is the ground truth
    val expect = graft.extract.BagAgg.aggregate(spark,
        spark.createDataset(batch1 ++ batch2)).collect()
      .map(f => (f.subj, f.pred, f.obj) -> f.score).toMap
    expect.foreach { case (k, s) =>
      val u = last(k)
      assert(math.abs(u.score - s) < 1e-9,
        s"$k streaming ${u.score} != batch $s")
    }
  }
}
