package graft.train

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Candidate

/**
 * Distant-supervision training path (SURVEY.md §3.2, train/KBPTrainer.java):
 *  - label candidate pairs by joining a KB of known triples (broadcast —
 *    the "known-slot matching" join of RelationMentionAnnotator)
 *  - F4: drop features occurring < 5 times (KBPTrainer.java:414-416) —
 *    explode -> count -> filter -> SEMI-JOIN -> re-aggregate; the feature
 *    vocabulary never leaves the cluster (no driver collect)
 *  - T9: subsample negatives at 10% with a fixed seed
 *    (KBPTrainer.java:258-335; Random(0) becomes Spark's seeded sample)
 *  - per-relation binary logistic regression via spark.ml over hashed
 *    features (OneVsAllRelationExtractor.java:162-229's LinearClassifier
 *    becomes ml.classification.LogisticRegression), with per-relation
 *    decision thresholds tuned so no training negative crosses them
 *    (the reference's per-relation thresholds, Props.java:332-337)
 *  - K3: the trained model freezes to a TSV shipped as a classpath
 *    resource; extract.Scorer loads it (hand-derived trigger weights are
 *    the fallback when the resource is absent)
 */
object Trainer {

  val FeatureCountThreshold = 5 // Props.java:146-147
  val NegativeSampleRatio = 0.10 // Props.java:148-149
  val Seed = 0L // KBPTrainer.java:258
  val NumFeatures: Int = 1 << 18 // hashed feature space (HashingTF)

  /** A trained per-relation binary LR over hashed features. */
  final case class LRModel(intercept: Double,
                           coefficients: org.apache.spark.ml.linalg.Vector,
                           threshold: Double)

  /** Inference-side view of one frozen LR (sparse, broadcastable;
   *  IntMap = specialized int keys, no boxing on the hot lookup path). */
  final case class FrozenLR(intercept: Double, threshold: Double,
                            weights: scala.collection.immutable.IntMap[Double])

  /** A5 alternate-value forms for known-slot matching
   *  (RelationMentionAnnotator.java:349-365 slot matching, :407-466
   *  alternate values): year-only variants for dates; honorific/suffix
   *  stripping and first+last form for 3+-token person names. */
  def alternateValues(obj: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    if (obj.matches("[12][0-9]{3}-[0-9X]{2}-[0-9X]{2}") &&
        !obj.endsWith("-XX-XX"))
      out += obj.take(4) + "-XX-XX" // year-only date variant
    val prefixes = Set("Mr.", "Mrs.", "Ms.", "Dr.")
    val suffixes = Set("Jr.", "Sr.", "II", "III")
    val toks = obj.split(" ").toSeq
    val stripped = toks.filterNot(t =>
      prefixes.contains(t) || suffixes.contains(t))
    if (stripped != toks && stripped.nonEmpty)
      out += stripped.mkString(" ")
    if (stripped.length >= 3 &&
        stripped.forall(t => t.nonEmpty && t.charAt(0).isUpper))
      out += s"${stripped.head} ${stripped.last}" // first+last person form
    out.result().distinct
  }

  /** Label candidates against a KB (subj, pred, obj): positives get the KB
   *  relation, unmatched pairs become negatives ("_NR"). The KB is
   *  broadcast expanded with each value's alternate forms so "1985-XX-XX"
   *  matches the KB's "1985-03-02" and "John Smith" matches
   *  "John Q. Smith Jr.". */
  def label(spark: SparkSession, cands: Dataset[Candidate],
            kb: DataFrame): DataFrame = {
    import spark.implicits._
    val altUdf = udf((o: String) => alternateValues(o))
    val base = kb.select($"subj", $"pred".as("label"), $"obj")
    val alts = base.withColumn("obj", explode(altUdf($"obj")))
    cands.toDF()
      .join(broadcast(base.unionByName(alts).distinct()),
        Seq("subj", "obj"), "left")
      .na.fill("_NR", Seq("label"))
  }

  /** F4: keep only features with corpus count >= threshold — explode ->
   *  count -> filter -> semi-join -> re-aggregate. No collect: at corpus
   *  scale the raw feature vocabulary is cluster-sized, so it stays
   *  distributed end to end. */
  def thresholdFeatures(spark: SparkSession, labeled: DataFrame,
                        minCount: Int = FeatureCountThreshold): DataFrame = {
    import spark.implicits._
    // localCheckpoint PINS the generated ids: exploded and the final join
    // are two subtrees of this plan, and monotonically_increasing_id is
    // partition-dependent — if AQE or a recompute repartitioned one side,
    // feature vectors would silently reattach to the wrong training rows.
    // Checkpointing materializes the ids once so both sides read the same
    // rows (cheaper than persist-and-hope: persist can be evicted, a
    // checkpoint cannot).
    val withId = labeled.withColumn("_fid", monotonically_increasing_id())
      .localCheckpoint(true)
    val exploded = withId.select($"_fid", explode($"features").as("f"))
    val keep = exploded.groupBy($"f").agg(count(lit(1)).as("n"))
      .filter($"n" >= minCount).select($"f")
    val kept = exploded.join(keep, Seq("f"), "left_semi")
      .groupBy($"_fid").agg(sort_array(collect_list($"f")).as("_kept"))
    withId.join(kept, Seq("_fid"), "left")
      .withColumn("features",
        coalesce($"_kept", array().cast("array<string>")))
      .drop("_fid", "_kept")
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
   *  features. The decision threshold per relation is tuned on `tuneOn`
   *  (default: the training set): the smallest cutoff no negative example
   *  crosses, floored at the global 0.5 — a relation whose negatives reach
   *  0.99 gets an unreachable threshold (rules-only). */
  def trainOneVsAll(spark: SparkSession, labeled: DataFrame,
                    rels: Seq[String], numFeatures: Int = NumFeatures,
                    tuneOn: Option[DataFrame] = None)
      : Map[String, LRModel] = {
    import org.apache.spark.ml.feature.HashingTF
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.functions.vector_to_array
    val tf = new HashingTF().setInputCol("features").setOutputCol("fv")
      .setNumFeatures(numFeatures)
    val vecs = tf.transform(labeled).select(col("label"), col("fv")).cache()
    val tune = tuneOn.map(d =>
      tf.transform(d).select(col("label"), col("fv")).cache())
    val out = rels.map { rel =>
      val data = vecs.withColumn("y",
        when(col("label") === rel, 1.0).otherwise(0.0))
      val lr = new LogisticRegression().setFeaturesCol("fv").setLabelCol("y")
        .setRegParam(1e-4).setMaxIter(50)
      val model = lr.fit(data)
      val negScores = model.transform(
          tune.getOrElse(vecs).filter(col("label") =!= rel))
        .select(max(vector_to_array(col("probability")).getItem(1)))
        .head()
      val maxNeg = if (negScores.isNullAt(0)) 0.0 else negScores.getDouble(0)
      val thr =
        if (maxNeg >= 0.95) 2.0 // LR unusable for this relation: rules only
        else math.max(0.5, maxNeg + 0.01)
      rel -> LRModel(model.intercept, model.coefficients, thr)
    }.toMap
    vecs.unpersist()
    tune.foreach(_.unpersist())
    out
  }

  /** Inference view of a freshly-trained LRModel (sparse IntMap weights) —
   *  what the frozen-TSV loader would produce, without the round-trip;
   *  the ensemble's per-component classify (Classifiers.classifyWith)
   *  consumes these. */
  def toFrozen(m: LRModel): FrozenLR = {
    val ws = scala.collection.immutable.IntMap.newBuilder[Double]
    m.coefficients.foreachActive((i, w) => if (w != 0.0) ws += (i -> w))
    FrozenLR(m.intercept, m.threshold, ws.result())
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

  /** Freeze to TSV (rel, idx, weight); idx -1 = intercept, -2 = threshold.
   *  Deterministic line order so the frozen artifact diffs cleanly. */
  def saveWeightsTsv(weights: Map[String, LRModel], path: String): Unit = {
    val lines = weights.toSeq.sortBy(_._1).flatMap { case (rel, m) =>
      Seq(s"$rel\t-1\t${m.intercept}", s"$rel\t-2\t${m.threshold}") ++
        m.coefficients.toArray.zipWithIndex.collect {
          case (w, i) if w != 0.0 => s"$rel\t$i\t$w"
        }
    }
    val p = java.nio.file.Paths.get(path)
    Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(p,
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** Load a frozen TSV model from a stream (classpath resource). */
  def loadFrozen(in: java.io.InputStream): Map[String, FrozenLR] = {
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      src.getLines().filter(_.nonEmpty).map { line =>
        val Array(rel, idx, w) = line.split("\t")
        (rel, idx.toInt, w.toDouble)
      }.toSeq.groupBy(_._1).map { case (rel, rows) =>
        val intercept = rows.find(_._2 == -1).map(_._3).getOrElse(0.0)
        val threshold = rows.find(_._2 == -2).map(_._3).getOrElse(0.5)
        val ws = scala.collection.immutable.IntMap(
          rows.filter(_._2 >= 0).map(r => r._2 -> r._3): _*)
        rel -> FrozenLR(intercept, threshold, ws)
      }
    } finally src.close()
  }

  /** Full training pass over a pages corpus; rels defaults to the ones
   *  present in the KB. Thresholds are tuned on the FULL labeled set (not
   *  the negative-subsampled training set) so unsampled negatives cannot
   *  sit above the tuned cutoff. */
  def train(spark: SparkSession, pages: Dataset[graft.model.Page],
            kb: DataFrame, rels: Seq[String] = Nil)
      : Map[String, LRModel] = {
    import spark.implicits._
    val sents = graft.pipeline.KGPipeline.sentences(spark, pages)
    val cands = sents.mapPartitions(
      _.flatMap(graft.extract.Candidates.fromSentence))
    val labeled = thresholdFeatures(spark, label(spark, cands, kb)).cache()
    val sampled = subsampleNegatives(labeled)
    val targets = if (rels.nonEmpty) rels
      else labeled.filter($"label" =!= "_NR")
        .select($"label").distinct().as[String].collect().toSeq.sorted
    val out = trainOneVsAll(spark, sampled, targets, NumFeatures,
      tuneOn = Some(labeled))
    labeled.unpersist()
    out
  }
}
