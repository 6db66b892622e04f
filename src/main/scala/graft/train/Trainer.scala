package graft.train

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Candidate, Relations}

/**
 * Distant-supervision training path (SURVEY.md §3.2, train/KBPTrainer.java):
 *  - label candidate pairs by joining a KB of known triples (broadcast —
 *    the "known-slot matching" join of RelationMentionAnnotator)
 *  - F4: drop features occurring < 5 times
 *    (KBPTrainer.java:414-416) — explode -> count -> semi-join, the
 *    pushdown-friendly plan
 *  - T9: subsample negatives at 10% with a fixed seed
 *    (KBPTrainer.java:258-335; Random(0) becomes Spark's seeded sample)
 *  - per-relation binary logistic regression via spark.ml over hashed
 *    features (OneVsAllRelationExtractor.java:162-229's LinearClassifier
 *    becomes ml.classification.LogisticRegression)
 * The frozen production weights in extract.Scorer stand in for a shipped
 * model; this module is the in-Spark re-training path.
 */
object Trainer {

  val FeatureCountThreshold = 5 // Props.java:146-147
  val NegativeSampleRatio = 0.10 // Props.java:148-149
  val Seed = 0L // KBPTrainer.java:258

  /** Label candidates against a KB (subj, pred, obj): positives get the KB
   *  relation, unmatched pairs become negatives ("_NR"). */
  def label(spark: SparkSession, cands: Dataset[Candidate],
            kb: DataFrame): DataFrame = {
    import spark.implicits._
    cands.toDF()
      .join(broadcast(kb.select($"subj", $"pred".as("label"), $"obj")),
        Seq("subj", "obj"), "left")
      .na.fill("_NR", Seq("label"))
  }

  /** F4: keep only features with corpus count >= threshold. */
  def thresholdFeatures(spark: SparkSession, labeled: DataFrame,
                        minCount: Int = FeatureCountThreshold): DataFrame = {
    import spark.implicits._
    val counts = labeled.select(explode($"features").as("f"))
      .groupBy($"f").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount)
    val keep = counts.select($"f").as[String].collect().toSet
    val keepB = spark.sparkContext.broadcast(keep)
    val filterUdf = udf((fs: Seq[String]) => fs.filter(keepB.value))
    labeled.withColumn("features", filterUdf($"features"))
  }

  /** T9: downsample negatives, keep all positives (seeded, deterministic
   *  given partitioning). */
  def subsampleNegatives(labeled: DataFrame,
                         ratio: Double = NegativeSampleRatio): DataFrame = {
    val neg = labeled.filter(col("label") === "_NR")
      .sample(withReplacement = false, ratio, Seed)
    labeled.filter(col("label") =!= "_NR").unionByName(neg)
  }

  /** Train one binary LR per relation (one-vs-all) over hashed sparse
   *  features; returns rel -> (featureIndex -> weight) ready to broadcast. */
  def trainOneVsAll(spark: SparkSession, labeled: DataFrame,
                    rels: Seq[String], numFeatures: Int = 1 << 18)
      : Map[String, org.apache.spark.ml.linalg.Vector] = {
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.classification.LogisticRegression
    val tf = new HashingTF().setInputCol("features").setOutputCol("fv")
      .setNumFeatures(numFeatures)
    val vecs = tf.transform(labeled).select(col("label"), col("fv")).cache()
    val out = rels.map { rel =>
      val data = vecs.withColumn("y",
        when(col("label") === rel, 1.0).otherwise(0.0))
      val lr = new LogisticRegression().setFeaturesCol("fv").setLabelCol("y")
        .setRegParam(1e-4).setMaxIter(50)
      val model = lr.fit(data)
      rel -> model.coefficients
    }.toMap
    vecs.unpersist()
    out
  }

  /** K3 model serialization: weights as a parquet table (rel, idx, w) —
   *  loadable into a broadcast map on any cluster (replaces the
   *  reference's Java serialization, classify/RelationClassifier.java:94-107). */
  def saveWeights(spark: SparkSession,
                  weights: Map[String, org.apache.spark.ml.linalg.Vector],
                  path: String): Unit = {
    import spark.implicits._
    weights.toSeq.flatMap { case (rel, v) =>
      v.toArray.zipWithIndex.collect { case (w, i) if w != 0.0 => (rel, i, w) }
    }.toDF("rel", "idx", "weight").write.mode("overwrite").parquet(path)
  }

  def loadWeights(spark: SparkSession, path: String)
      : Map[String, Map[Int, Double]] = {
    import spark.implicits._
    spark.read.parquet(path).as[(String, Int, Double)].collect()
      .groupBy(_._1).map { case (rel, rows) =>
        rel -> rows.map(r => r._2 -> r._3).toMap
      }
  }

  /** Full training pass over a pages corpus; rels defaults to the ones
   *  present in the KB. */
  def train(spark: SparkSession, pages: Dataset[graft.model.Page],
            kb: DataFrame, rels: Seq[String] = Nil)
      : Map[String, org.apache.spark.ml.linalg.Vector] = {
    import spark.implicits._
    val sents = graft.pipeline.KGPipeline.sentences(spark, pages)
    val cands = sents.mapPartitions(
      _.flatMap(graft.extract.Candidates.fromSentence))
    val labeled = subsampleNegatives(
      thresholdFeatures(spark, label(spark, cands, kb)))
    val targets = if (rels.nonEmpty) rels
      else labeled.filter($"label" =!= "_NR")
        .select($"label").distinct().as[String].collect().toSeq.sorted
    trainOneVsAll(spark, labeled, targets)
  }
}
