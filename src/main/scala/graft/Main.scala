package graft

import org.apache.spark.SparkConf
import org.apache.spark.sql.{Dataset, SparkSession}

import graft.io.TableIO
import graft.model.{Page, Triple}
import graft.pipeline.KGPipeline

/**
 * spark-submit entry point for the KG-construction pipeline (north_star:
 * "launched via spark-submit and validated at N and 4N executors",
 * "resumable from Iceberg-snapshot checkpoints"). The reference's
 * equivalent is the properties-file-driven `SlotfillingTask` launcher
 * (kbp/slotfilling/SlotfillingTask.java); ours is a plain CLI over
 * `KGPipeline.run`:
 *
 *   spark-submit --class graft.Main graft.jar \
 *     --pages  <parquet dir>   # input_hint table (url, warc_ts, html, text, lang)
 *     --tables <dir>           # stage-snapshot root; re-running resumes here
 *     [--out <dir>]            # additionally export triples (partitioned by pred)
 *     [--run-id <id>]          # lineage tag written into every snapshot row
 *     [--dedup]                # stage 0: exact crawl dedup before NLP
 *
 * `--synthetic N` replaces `--pages` with the deterministic PageGen corpus
 * (the committed test/bench generator — no external data).
 *
 * Master, deploy mode, executor count/memory all come from spark-submit;
 * running the class directly (sbt runMain) falls back to local[*]. Shuffle
 * parallelism defaults to the cluster's core count when the submitter did
 * not set it — at 1000 executors that is the scale knob, never a constant.
 */
object Main {

  val Usage: String =
    """usage: graft.Main (--pages <parquet dir> | --synthetic <nPages>)
      |                  [--tables <snapshot root>] [--out <dir>] [--run-id <id>] [--dedup]""".stripMargin

  final case class Opts(
      pages: Option[String] = None,
      synthetic: Option[Int] = None,
      tables: Option[String] = None,
      out: Option[String] = None,
      runId: String = "run-0",
      dedup: Boolean = false)

  @annotation.tailrec
  def parse(args: List[String], acc: Opts = Opts()): Opts = args match {
    case Nil                        => acc
    case "--pages" :: v :: rest     => parse(rest, acc.copy(pages = Some(v)))
    case "--synthetic" :: v :: rest => parse(rest, acc.copy(synthetic = Some(v.toInt)))
    case "--tables" :: v :: rest    => parse(rest, acc.copy(tables = Some(v)))
    case "--out" :: v :: rest       => parse(rest, acc.copy(out = Some(v)))
    case "--run-id" :: v :: rest    => parse(rest, acc.copy(runId = v))
    case "--dedup" :: rest          => parse(rest, acc.copy(dedup = true))
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown argument '$other'\n$Usage")
  }

  /** The input corpus. A real crawl table is read with an explicit
   *  input_hint column list so parquet prunes whatever extra columns a
   *  wider production table carries; the synthetic corpus is sliced 4×
   *  per core (straggler amortization — same rule as Bench.pagesDs). */
  def pagesOf(spark: SparkSession, opts: Opts): Dataset[Page] = {
    import spark.implicits._
    (opts.pages, opts.synthetic) match {
      case (Some(dir), None) =>
        spark.read.parquet(dir)
          .select("url", "warc_ts", "html", "text", "lang").as[Page]
      case (None, Some(n)) =>
        val slices = spark.sparkContext.defaultParallelism * 4
        spark.range(0, n.toLong, 1, slices)
          .map(i => graft.fixtures.PageGen.page(i.toInt)._1)
      case _ =>
        throw new IllegalArgumentException(
          s"exactly one of --pages / --synthetic is required\n$Usage")
    }
  }

  /** Job body with the session supplied by the caller (spec-testable).
   *  With `--tables` the triples land in that root as the pred-partitioned
   *  `triples` snapshot (the resumable graph table); `--out` additionally
   *  exports them to a consumer location with the same partitioning. */
  def runJob(spark: SparkSession, opts: Opts): Dataset[Triple] = {
    val io = opts.tables.map(new TableIO(_, spark))
    val triples =
      KGPipeline.run(spark, pagesOf(spark, opts), io, opts.runId, opts.dedup)
    opts.out.foreach { dir =>
      triples.write.mode("overwrite").partitionBy("pred").parquet(dir)
    }
    triples
  }

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList)
    // spark-submit materializes --master/--conf as spark.* system
    // properties; their absence means a bare JVM launch -> local fallback
    val submitted = new SparkConf().contains("spark.master")
    val builder = SparkSession.builder()
      .appName("graft-kg")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    val spark =
      (if (submitted) builder else builder.master("local[*]")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!spark.sparkContext.getConf.contains("spark.sql.shuffle.partitions"))
      spark.conf.set("spark.sql.shuffle.partitions",
        spark.sparkContext.defaultParallelism.toString)

    val t0 = System.nanoTime()
    val nTriples = runJob(spark, opts).count() // snapshot-backed: metadata count when --tables is set
    val sec = (System.nanoTime() - t0) / 1e9
    def fd(v: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // one machine-parseable summary line, same convention as Bench
    println(s"""{"triples":$nTriples,"sec":${fd(sec)},""" +
      s""""run_id":"${opts.runId}","tables":${opts.tables.isDefined}}""")
    spark.stop()
  }
}
