package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.model.{Page, SlotFill}
import graft.pipeline.KGPipeline
import graft.io.TableIO

/**
 * Structured-Streaming ingestion front-end (optional — the reference is
 * batch-only, SURVEY.md §1.4; this is the incremental-crawl path a
 * production KG keeps running).
 *
 * Everything through per-mention scoring is stateless per document, so it
 * streams as-is; bag aggregation / consistency / linking are corpus-global,
 * so each micro-batch appends RAW fills to a snapshot table and the global
 * stages run as periodic batch compaction over the accumulated log — the
 * standard streaming-ingest + batch-merge (kappa-ish) split.
 */
object StreamIngest {

  /** pages stream -> scored per-mention fills (stateless transforms only). */
  def fillsStream(spark: SparkSession, pages: Dataset[Page]): Dataset[SlotFill] =
    KGPipeline.mentionFills(spark, KGPipeline.sentences(spark, pages))

  /** Run the streaming front-end: append per-batch fills to
   *  `<root>/fills_log`, then batch-compact into triples on demand. */
  def start(spark: SparkSession, pages: Dataset[Page], root: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    fillsStream(spark, pages).writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$root/_stream_checkpoint")
      .format("parquet")
      .option("path", s"$root/fills_log")
      .start()
  }

  /** Batch compaction: accumulated fills log -> canonical triples table
   *  (same stage order as KGPipeline.run: unary -> link -> symmetric ->
   *  per-canonical-entity consistency -> merge). */
  def compact(spark: SparkSession, root: String): Dataset[graft.model.Triple] = {
    import spark.implicits._
    // the streamed fills already went through the fused unary pass
    val fills = spark.read.parquet(s"$root/fills_log").as[SlotFill]
    val bags = KGPipeline.aggregateBags(spark, fills)
    val linked = KGPipeline.symmetricExpand(spark,
      KGPipeline.linked(spark, bags))
    KGPipeline.consistentTriples(spark, linked)
  }
}
