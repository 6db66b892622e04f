package graft.link

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal KG operators: fact versioning over timestamped observations and
 * build-to-build triple diffs.
 *
 * The reference pipeline emits one static triple set per corpus
 * (SimpleSlotFiller.java — a run is a snapshot); at web scale the SAME
 * pipeline runs per crawl, and the sequence of snapshots is the real
 * product: "who is org X's CEO *now*, and since when" needs the
 * observation history, and an incremental-recrawl loop
 * ([[graft.pipeline.KGPipeline.incrementalRunSig]]) needs a diff between
 * consecutive builds to publish. Both operators are single-shuffle
 * column-expression plans.
 */
object Temporal {

  /**
   * Slowly-changing-fact intervals: collapse timestamped observations of a
   * (subj, pred) into the sequence of distinct-object validity intervals.
   *
   * Input: (subj, pred, obj, ts) observation rows (one per crawl sighting).
   * Output: (subj, pred, obj, valid_from, valid_to, n_obs) — one row per
   * RUN of consecutive (in ts order) observations of the same object;
   * `valid_to` is the next run's start, null for the currently-valid run.
   * An object that comes back later opens a NEW interval (this is interval
   * semantics, not grouping: A,A,B,A → [A), [B), [A, open)).
   *
   * Ties on ts break by (obj ASC) so the run structure is deterministic
   * under any partitioning.
   *
   * Scale shape: every window and the run aggregate share the ONE
   * hash-partitioning on (subj, pred) — Catalyst plans a single exchange
   * and sorts within partitions; per-key cost is the observation count of
   * that fact, so skew is bounded by the hottest fact's sighting count
   * (a crawl frequency, not a corpus size).
   */
  def factIntervals(obs: DataFrame): DataFrame = {
    val byFact = Window.partitionBy("subj", "pred").orderBy(col("ts"), col("obj"))
    val runs = obs
      .withColumn("_new_run",
        when(lag(col("obj"), 1).over(byFact).isNull ||
          lag(col("obj"), 1).over(byFact) =!= col("obj"), 1L).otherwise(0L))
      .withColumn("_run", sum(col("_new_run")).over(byFact))
      .groupBy(col("subj"), col("pred"), col("_run"))
      .agg(first(col("obj")).as("obj"),
        min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val byRun = Window.partitionBy("subj", "pred").orderBy(col("_run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .select(col("subj"), col("pred"), col("obj"),
        col("valid_from"), col("valid_to"), col("n_obs"))
  }

  /**
   * Diff two KG builds on the (subj, pred, obj) key: `added` / `removed` /
   * `rescored` (key present in both, score differs) / `unchanged`. The
   * publishable changelog of one incremental-recrawl round — full-outer
   * join on the triple key, one shuffle per side, no row-vs-row scan.
   * Scores compare EXACTLY (both builds round to 12 decimals upstream,
   * [[graft.pipeline.KGPipeline.aggregateBags]]), so "rescored" means the
   * evidence actually changed, not float noise.
   */
  def kgDelta(prev: DataFrame, next: DataFrame): DataFrame = {
    val a = prev.select(col("subj"), col("pred"), col("obj"),
      col("score").as("old_score"))
    val b = next.select(col("subj"), col("pred"), col("obj"),
      col("score").as("new_score"))
    a.join(b, Seq("subj", "pred", "obj"), "full_outer")
      .select(col("subj"), col("pred"), col("obj"),
        col("old_score"), col("new_score"),
        when(col("old_score").isNull, lit("added"))
          .when(col("new_score").isNull, lit("removed"))
          .when(col("old_score") === col("new_score"), lit("unchanged"))
          .otherwise(lit("rescored")).as("status"))
  }
}
