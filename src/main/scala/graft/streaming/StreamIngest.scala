package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
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

  /** Per-stream redo telemetry, keyed by the recrawl loop's root dir:
   *  urls re-annotated (status new/changed) by that loop's LAST
   *  incremental batch. Replaces the process-global
   *  KGPipeline.lastIncrementalRedo for streaming callers — two
   *  interleaved loops no longer race on one slot. */
  private val redoCounts =
    new java.util.concurrent.ConcurrentHashMap[String, Long]()
  def lastRedoCount(root: String): Option[Long] =
    Option(redoCounts.get(root))

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

  /** Recrawl suppression with BOUNDED state: exact-content dedup keyed on
   *  md5(text), event-time-watermarked on warc_ts. The state store keeps
   *  one key per distinct page inside the watermark horizon and evicts it
   *  once the watermark passes — at crawl scale (10^12 docs) state is a
   *  function of the horizon, never of crawl history. A re-fetch of the
   *  same content (mirror URL, recrawl) inside the horizon is dropped
   *  before it reaches the (expensive) NLP stage. */
  def dedupPagesStream(pages: Dataset[Page],
                       watermark: String = "1 hour"): Dataset[Page] = {
    import pages.sparkSession.implicits._
    pages.toDF()
      .withColumn("content_key", md5(col("text")))
      .withWatermark("warc_ts", watermark)
      .dropDuplicatesWithinWatermark("content_key")
      .drop("content_key")
      .as[Page]
  }

  /** Watermarked tumbling-window crawl-rate rollup (the streaming analogue
   *  of the batch hourly aggregation, q12 shape): pages per (event-time
   *  window, lang) plus total chars, emitted in APPEND mode — each
   *  window's row is emitted exactly once, when the watermark passes the
   *  window end, so downstream consumers see final counts only. State is
   *  one row per OPEN (window, lang) inside the horizon — bounded by the
   *  watermark delay × language count, never by crawl history. */
  def crawlRateStream(pages: Dataset[Page], watermark: String = "1 hour",
                      windowLen: String = "1 hour"): DataFrame =
    pages.toDF()
      .withWatermark("warc_ts", watermark)
      .groupBy(window(col("warc_ts"), windowLen), col("lang"))
      .agg(count(lit(1)).as("n_pages"),
        sum(length(col("text"))).as("n_chars"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_pages"), col("n_chars"))

  /** Streaming gap-based sessionization — the stream twin of
   *  `graft.ops.Sessions.sessionize`, built on Spark's native
   *  `session_window` (watermark-bounded state: a user's open session is
   *  one window row; sessions older than the watermark finalize and emit
   *  in Append mode, so state never grows past horizon × active users).
   *  Same gap semantics as the batch pass EXCEPT the boundary:
   *  `session_window` merges events strictly closer than the gap
   *  (start + gap is exclusive), while the batch recurrence breaks only
   *  when the gap is exceeded — the parity spec uses off-boundary
   *  fixtures, and boundary-exact events are the documented difference.
   *  Emits (user_id, session_start, session_end, n_events) per CLOSED
   *  session. */
  def sessionStream(events: DataFrame, gapMinutes: Int = 30,
                    watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))

  /** Continuous-recrawl driver: each micro-batch is one crawl SNAPSHOT
   *  (not an increment of new files — configure the source so a trigger
   *  delivers a whole snapshot, e.g. `maxFilesPerTrigger=1` over
   *  one-file-per-snapshot drops). Per batch the loop:
   *
   *   1. computes fills — full NLP for the FIRST snapshot, then
   *      [[KGPipeline.incrementalFillsSig]] against the previous
   *      snapshot's committed (url, md5) signature table, so every later
   *      snapshot pays NLP only for its delta, forever;
   *   2. materializes `fills_raw`, the downstream triple build, and the
   *      next signature table under `root/state/<batchId>/`;
   *   3. publishes the [[graft.link.Temporal.kgDelta]] changelog vs the
   *      previous snapshot's triples.
   *
   *  State versions are batchId-keyed directories with an explicit
   *  `_COMMITTED` marker written LAST, so a batch that dies mid-write is
   *  never picked up as carry-forward state, and a foreachBatch retry
   *  (same batchId) just overwrites the torn attempt — the loop is
   *  restart-safe from the stream checkpoint. Local-FS markers stand in
   *  for what an object-store deployment does with Iceberg snapshot
   *  commits (SURVEY.md §1.4); the dataflow is identical. */
  def recrawlLoop(spark: SparkSession, snapshots: Dataset[Page],
                  root: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    snapshots.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", s"$root/_recrawl_checkpoint")
      .foreachBatch { (batch: Dataset[Page], batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val stateRoot = new java.io.File(s"$root/state")
        val prevId = Option(stateRoot.listFiles()).getOrElse(Array.empty)
          .filter(f => f.getName.matches("\\d+") &&
            new java.io.File(f, "_COMMITTED").exists)
          .map(_.getName.toLong).filter(_ < batchId)
          .sorted.lastOption
        val dir = s"$root/state/$batchId"
        val pages = batch.persist()
        // per-invocation delta handle — concurrent recrawl loops in one
        // session each own (and release) their own cache, no global slot
        val incr = prevId.map { p =>
          KGPipeline.incrementalFillsDelta(s,
            s.read.parquet(s"$root/state/$p/sig"),
            s.read.parquet(s"$root/state/$p/fills_raw").as[SlotFill],
            pages)
        }
        val fills = incr.map(_.fills).getOrElse(
          KGPipeline.mentionFills(s, KGPipeline.sentences(s, pages)))
        fills.write.mode("overwrite").parquet(s"$dir/fills_raw")
        incr.foreach { h =>
          // per-stream telemetry keyed by the loop's root dir (r6 advice
          // fix: the process-global KGPipeline.lastIncrementalRedo raced
          // when two recrawl loops interleaved in one session — one
          // loop's redo count could be reported as the other's)
          redoCounts.put(root, h.redoCount)
          h.release()
        }
        val raw = s.read.parquet(s"$dir/fills_raw").as[SlotFill]
        val bags = KGPipeline.yThenNoisyOrGate(s,
          KGPipeline.aggregateBags(s, raw))
        KGPipeline.consistentTriples(s,
          KGPipeline.symmetricExpand(s, KGPipeline.linked(s, bags)))
          .write.mode("overwrite").parquet(s"$dir/triples")
        graft.link.Linker.release()
        KGPipeline.pageSignatures(pages)
          .write.mode("overwrite").parquet(s"$dir/sig")
        prevId.foreach { p =>
          graft.link.Temporal.kgDelta(
            s.read.parquet(s"$root/state/$p/triples"),
            s.read.parquet(s"$dir/triples"))
            .write.mode("overwrite").parquet(s"$dir/delta")
        }
        pages.unpersist()
        new java.io.File(dir, "_COMMITTED").createNewFile()
        ()
      }
      .start()
  }

  /** Streaming state for one (subj, pred, obj): the running log-complement
   *  of the noisy-or over every provenance seen so far (order-independent,
   *  so arrival order across micro-batches cannot change the result). */
  final case class TripleState(logComp: Double, nProv: Long)

  /** One incremental merged-confidence update emitted per micro-batch in
   *  which the triple gained provenances. */
  final case class TripleUpdate(subj: String, pred: String, obj: String,
                                score: Double, n_prov: Long)

  /** Incremental noisy-or merge — the streaming analogue of
   *  `BagAgg.aggregate(NoisyOr)`: per-(subj, pred, obj) state via
   *  flatMapGroupsWithState holds only the running log-complement (two
   *  numbers per live triple, never the provenance list), and each
   *  micro-batch emits the updated merged score for the triples it
   *  touched (OutputMode.Update). Identical math to the batch combinator:
   *  score = 1 - exp(sum(log1p(-min(s, 1)))), so the final update equals
   *  the batch noisy-or over all fills (StreamingSpec asserts it). */
  def noisyOrStream(fills: Dataset[SlotFill]): Dataset[TripleUpdate] = {
    import fills.sparkSession.implicits._
    fills.groupByKey(f => (f.subj, f.pred, f.obj))
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (key: (String, String, String), it: Iterator[SlotFill],
         state: GroupState[TripleState]) => {
          val prior = state.getOption.getOrElse(TripleState(0.0, 0L))
          var lc = prior.logComp
          var n = prior.nProv
          it.foreach { f =>
            lc += math.log1p(-math.min(f.score, 1.0))
            n += 1L
          }
          state.update(TripleState(lc, n))
          Iterator.single(TripleUpdate(key._1, key._2, key._3,
            math.min(1.0 - math.exp(lc), 1.0), n))
        })
  }
}
