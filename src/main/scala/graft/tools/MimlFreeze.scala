package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.classify.MimlEm
import graft.model.Relations

/** Train the MIML-RE z/y EM (classify/JointBayesRelationExtractor.java
 *  analogue) on the SAME synthetic distant supervision TrainFreeze uses,
 *  and freeze the z weights beside the one-vs-all LR resource. Bags =
 *  (subj, obj) candidate groups; positive labels from the PageGen gold KB
 *  join; the reference's PRODUCTION config — 8 epochs x 3 folds (Props
 *  train.jointbayes.*) — with the trainer's EM-fixpoint early stop (a
 *  full epoch that changes no z assignment ends training; the toy
 *  corpus typically fixpoints after 2-3 epochs). */
object MimlFreeze {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/miml_z_weights.tsv"
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-miml-train")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // held-out index range, like TrainFreeze (no e2e-entity contamination)
    val (pages, gold) = graft.fixtures.PageGen.corpus(n, offset = 10000)
    val kb = gold.toSeq.map(g => (g.subj,
        Relations.fromString(g.pred).map(_.name).getOrElse(g.pred), g.obj))
      .toDF("subj", "pred", "obj")
    val sents = graft.pipeline.KGPipeline.sentences(spark,
      spark.createDataset(pages))
    val cands = sents.mapPartitions(
      _.flatMap(graft.extract.Candidates.fromSentence))
    val labeled = graft.train.Trainer.label(spark, cands, kb)
    // bags = (subj, obj) groups; deterministic ids via a sorted window
    val keyed = labeled.select($"subj", $"obj", $"features", $"label")
      .withColumn("bag_id",
        dense_rank().over(org.apache.spark.sql.expressions.Window
          .orderBy($"subj", $"obj")).cast("long"))
      .cache()
    val bags = keyed.groupBy($"bag_id")
      .agg(sort_array(array_distinct(
        collect_list(when($"label" =!= "_NR", $"label")))).as("pos_labels"))
      .select($"bag_id", $"pos_labels").as[MimlEm.MimlBag]
    val mimlSents = keyed.select($"bag_id", $"features")
      .as[MimlEm.MimlSentence]
    val rels = keyed.filter($"label" =!= "_NR")
      .select($"label").distinct().as[String].collect().toSeq.sorted
    // 2^16 hashed z space: the 42-class multinomial fit is the freeze's
    // dominant cost and the toy corpus has ~10^4 distinct features.
    // 8 epochs x 3 folds = the reference's production config; the
    // trainer's convergence check stops at the EM fixpoint, keeping the
    // freeze tractable at toy scale
    val model = MimlEm.train(spark, mimlSents, bags, rels, epochs = 8,
      numFeatures = 1 << 16, folds = 3)
    MimlEm.saveTsv(model, out)
    println(s"[miml] trained ${rels.size} relations over " +
      s"${bags.count()} bags, froze z+y weights to $out")
    spark.stop()
  }
}
