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
}
