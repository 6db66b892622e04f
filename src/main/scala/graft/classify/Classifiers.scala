package graft.classify

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Candidate, Provenance, SlotFill}

/**
 * The smaller members of the reference's classifier zoo
 * (classify/ModelType.java:12-25), Spark-first:
 *
 *  - C7 GoldClassifier (classify/GoldClassifier.java:24-66): memorizes a
 *    gold key and answers on (entity, slotValue) match — the test-oracle
 *    harness component.
 *  - C8 HackyModelCombination (classify/HackyModelCombination.java:26-60):
 *    union two models' fills, preferring the first on key collision.
 *  - C6 EnsembleRelationExtractor, AGREE_MOST combination
 *    (classify/EnsembleRelationExtractor.java:37-120, Props.java:344-346):
 *    majority vote over k models' fill sets, mean score of agreeing votes.
 */
object Classifiers {

  /** C7: broadcast the gold key; candidates matching (subj, obj) emit the
   *  gold relations at score 1.0. */
  def goldClassifier(spark: SparkSession, gold: DataFrame)
      : Dataset[Candidate] => Dataset[SlotFill] = {
    import spark.implicits._
    val key = gold.select("subj", "pred", "obj").distinct()
      .as[(String, String, String)].collect()
      .groupBy(t => (t._1, t._3)).map { case (k, v) => k -> v.map(_._2).toSeq }
    val b = spark.sparkContext.broadcast(key)
    cands => cands.flatMap { c =>
      b.value.getOrElse((c.subj, c.obj), Nil).map { rel =>
        SlotFill(c.subj, c.subj_type, rel, c.obj, c.obj_type, 1.0,
          Provenance(c.doc_id, c.url, c.sent_idx, c.ent_b, c.ent_e,
            c.slot_b, c.slot_e))
      }
    }
  }

  /** C8: fills from `preferred` win on (subj, pred, obj) collision; the
   *  rest of `fallback` is appended (one anti-join, no all-pairs). */
  def combine(spark: SparkSession, preferred: Dataset[SlotFill],
              fallback: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    val keyCols = Seq("subj", "pred", "obj")
    val extra = fallback.toDF().join(preferred.toDF().select(
      keyCols.map(col): _*).distinct(), keyCols, "left_anti")
    preferred.toDF().unionByName(extra).as[SlotFill]
  }

  /** C6 AGREE_MOST: keep fills proposed by a strict majority of the k
   *  models; score = mean of the agreeing scores; provenance = the
   *  highest-scoring vote's. One union + one groupBy on the triple key. */
  def ensemble(spark: SparkSession, models: Seq[Dataset[SlotFill]])
      : Dataset[SlotFill] = {
    import spark.implicits._
    require(models.nonEmpty)
    val k = models.size
    val all = models.map(_.toDF()).reduce(_ unionByName _)
    all.groupBy($"subj", $"subj_type", $"pred", $"obj", $"obj_type")
      .agg(count(lit(1)).as("votes"), avg($"score").as("score"),
        max(struct($"score", $"prov")).getField("prov").as("prov"))
      .filter($"votes" * 2 > k)
      .select($"subj", $"subj_type", $"pred", $"obj", $"obj_type",
        $"score", $"prov")
      .as[SlotFill]
  }

  /** C6 ensemble training modes (EnsembleRelationExtractor.EnsembleMethod,
   *  classify/EnsembleRelationExtractor.java:40-47,159-230; the SUBAGGING
   *  default is Props.java:344-346). The reference shuffles datum indices
   *  on the driver and deals them round-robin into k disjoint subsamples;
   *  at corpus scale the training set is cluster-sized, so the deal here
   *  is a deterministic hash of the datum's bag key mod k — disjoint,
   *  covering, and keeps all mentions of one (subj, obj, label) bag in the
   *  same subsample (the reference partitions at the same bag granularity:
   *  KBPDataset rows are sentence groups). */
  def subagSamples(labeled: DataFrame, k: Int, seed: Long = 0L)
      : Seq[DataFrame] = {
    require(k >= 1)
    val dealt = labeled.withColumn("_sample",
      pmod(xxhash64(lit(seed), col("subj"), col("obj"), col("label")),
        lit(k.toLong)))
    (0 until k).map(s => dealt.filter(col("_sample") === s).drop("_sample"))
  }

  /** C6 BAGGING (:165-168 via sampleData): k bootstrap resamples with
   *  replacement at the original expected size. Spark's poisson-based
   *  `sample(withReplacement = true)` is the standard distributed
   *  bootstrap (exact multinomial resampling needs a global index). */
  def bagSamples(labeled: DataFrame, k: Int, seed: Long = 0L)
      : Seq[DataFrame] =
    (0 until k).map(s =>
      labeled.sample(withReplacement = true, 1.0, seed + s))

  /** Classify candidates with ONE trained component model (broadcast map
   *  of per-relation frozen LRs) — the per-component step of the ensemble;
   *  combine k of these with `ensemble` (AGREE_MOST). Type gates and
   *  per-relation thresholds match the shipped-model path in
   *  extract.Scorer. */
  def classifyWith(spark: SparkSession, cands: Dataset[Candidate],
                   model: Map[String, graft.train.Trainer.FrozenLR])
      : Dataset[SlotFill] = {
    import spark.implicits._
    val b = spark.sparkContext.broadcast(model)
    cands.flatMap { c =>
      val hashed = graft.extract.Scorer.hashFeatures(c.features)
      val prov = Provenance(c.doc_id, c.url, c.sent_idx, c.ent_b, c.ent_e,
        c.slot_b, c.slot_e)
      graft.model.Relations.all.iterator.filter { m =>
        m.entityType == c.subj_type && m.validSlotTypes.contains(c.obj_type)
      }.flatMap { m =>
        b.value.get(m.name).flatMap { lr =>
          var s = lr.intercept
          var i = 0
          while (i < hashed.length) {
            s += lr.weights.getOrElse(hashed(i), 0.0); i += 1
          }
          val p = graft.extract.Scorer.sigmoid(s)
          if (p > lr.threshold)
            Some(SlotFill(c.subj, c.subj_type, m.name, c.obj, c.obj_type,
              p, prov))
          else None
        }
      }.toSeq
    }
  }
}
