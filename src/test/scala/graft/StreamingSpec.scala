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
}
