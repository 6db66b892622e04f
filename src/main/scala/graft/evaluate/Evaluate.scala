package graft.evaluate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scoring + threshold tuning (T7/T8 — evaluate/CustomSFScore.java:495-512,
 * KBPEvaluator.java:311-403).
 *
 * P = correct/responses, R = correct/answers, F = 2PR/(P+R); the threshold
 * sweep re-scores every cutoff in one pass (score once, then a windowed
 * cumulative count per threshold bucket — no per-threshold re-run).
 */
object Evaluate {

  /** Triple-set P/R/F1 of `got` (subj, pred, obj, score) vs `gold`
   *  (subj, pred, obj). */
  def prf(spark: SparkSession, got: DataFrame, gold: DataFrame): DataFrame = {
    val g = got.select("subj", "pred", "obj").distinct()
    val w = gold.select("subj", "pred", "obj").distinct()
    val correct = g.join(w, Seq("subj", "pred", "obj"), "left_semi").count()
    val responses = g.count()
    val answers = w.count()
    val p = if (responses == 0) 0.0 else correct.toDouble / responses
    val r = if (answers == 0) 0.0 else correct.toDouble / answers
    val f = if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    import spark.implicits._
    Seq((correct, responses, answers, p, r, f))
      .toDF("correct", "responses", "answers", "precision", "recall", "f1")
  }

  /** K2 `.curve` writer (KBPEvaluator.java:411-489): the threshold sweep
   *  as a P/R curve file (one CSV line per threshold, precision-sorted
   *  like the reference's curve output). */
  def writeCurve(sweep: DataFrame, path: String): Unit =
    sweep.select(col("threshold"), col("precision"), col("recall"),
        col("f1"))
      .orderBy(col("threshold"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)

  /** Threshold sweep (KBPEvaluator.java:311-403): for each threshold bucket
   *  t, P/R/F1 of {fills with score >= t}. One aggregation, no re-scoring:
   *  bucket counts + reverse cumulative sums. */
  def thresholdSweep(spark: SparkSession, scored: DataFrame, gold: DataFrame,
                     step: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buck = (col("score") / step).cast("int").cast("double") * step
    val g = scored.select(col("subj"), col("pred"), col("obj"),
      buck.as("bucket"))
      .join(gold.select("subj", "pred", "obj").withColumn("hit", lit(1)),
        Seq("subj", "pred", "obj"), "left")
      .na.fill(0, Seq("hit"))
    val perBucket = g.groupBy(col("bucket")).agg(
      count(lit(1)).as("n"), sum(col("hit")).as("correct"))
    // the un-partitioned window is over perBucket — at most 1/step + 1
    // rows regardless of corpus size (the distributed groupBy above did
    // the data-sized work), so the single-task sort is a dozen rows, not
    // a scale hazard
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val answers = gold.select("subj", "pred", "obj").distinct().count()
    perBucket
      .withColumn("responses", sum(col("n")).over(w))
      .withColumn("cum_correct", sum(col("correct")).over(w))
      .select(col("bucket").as("threshold"),
        col("responses"), col("cum_correct").as("correct"),
        (col("cum_correct") / col("responses")).as("precision"),
        (col("cum_correct") / lit(math.max(1L, answers))).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(lit(0.0)))
      .orderBy(col("threshold"))
  }
}
