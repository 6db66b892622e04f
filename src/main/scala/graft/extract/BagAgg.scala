package graft.extract

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.SlotFill

/**
 * Bag-level score aggregation modes — the MIML-RE inference combinators
 * (JointBayesRelationExtractor maxZGivenX/sumZGivenX/noisy-or,
 * classify/JointBayesRelationExtractor.java:2001-2051) plus the softmax
 * renormalization of RelationClassifier.classifyRelations
 * (classify/RelationClassifier.java:42-78, gamma=1.0 Props.java:495-501).
 * All expressible as Spark SQL aggregates — no custom
 * TypedImperativeAggregate needed (SURVEY.md §2.11).
 */
object BagAgg {

  sealed trait Mode
  case object NoisyOr extends Mode // 1 - prod(1-p), log-domain
  case object Max extends Mode
  case object Sum extends Mode // capped at 1.0

  def scoreAgg(mode: Mode): Column = mode match {
    case NoisyOr => lit(1.0) - exp(sum(log1p(-least(col("score"), lit(1.0)))))
    case Max => max(col("score"))
    case Sum => least(sum(col("score")), lit(1.0))
  }

  /** Aggregate per-mention fills into per-(pair, relation) bags with the
   *  chosen combinator; provenance = argmax mention (P1-as-column). */
  def aggregate(spark: SparkSession, fills: Dataset[SlotFill],
                mode: Mode = NoisyOr): Dataset[SlotFill] = {
    import spark.implicits._
    fills.toDF()
      .groupBy($"subj", $"subj_type", $"pred", $"obj", $"obj_type")
      .agg(scoreAgg(mode).as("score"),
        max(struct($"score".as("s"), $"prov")).getField("prov").as("prov"))
      .select($"subj", $"subj_type", $"pred", $"obj", $"obj_type",
        least($"score", lit(1.0)).as("score"), $"prov")
      .as[SlotFill]
  }

  /** C2's default output mode `y_then_noisy_or`
   *  (JointBayesRelationExtractor.java:1989-2110; mode constant
   *  Props.java:332-337): noisy-or aggregate the per-mention z scores,
   *  then keep only relations whose merged score crosses the
   *  per-relation y threshold (default 0.5). The per-relation thresholds
   *  come from the frozen trained model when shipped. */
  def yThenNoisyOr(spark: SparkSession, fills: Dataset[SlotFill],
                   thresholds: Map[String, Double] = Map.empty,
                   defaultThreshold: Double = 0.5): Dataset[SlotFill] = {
    import spark.implicits._
    val merged = aggregate(spark, fills, NoisyOr)
    val thrCol =
      if (thresholds.isEmpty) lit(defaultThreshold)
      else coalesce(element_at(typedLit(thresholds), $"pred"),
        lit(defaultThreshold))
    merged.toDF().filter($"score" >= thrCol).as[SlotFill]
  }

  /** T1: softmax-normalize scores within each bag (partition = the KBPair),
   *  gamma = 1.0: p_i' = exp(g*p_i) / sum_j exp(g*p_j). */
  def softmaxNormalize(df: DataFrame, gamma: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("subj"), col("obj"))
    df.withColumn("score",
      exp(col("score") * gamma) / sum(exp(col("score") * gamma)).over(w))
  }
}
