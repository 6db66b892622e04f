package graft.tools

import org.apache.spark.sql.SparkSession
import graft.model.Relations
import graft.train.Trainer

/** Train the one-vs-all LR on synthetic distant supervision (PageGen gold
 *  as the KB — SURVEY.md §3.2's trainingDataFromTSV analogue) and freeze
 *  the weights + per-relation thresholds to the classpath resource that
 *  extract.Scorer loads. Run once, commit the TSV: the shipped model. */
object TrainFreeze {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200
    val out = if (args.length > 1) args(1)
      else "src/main/resources/graft/lr_weights.tsv"
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-train")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // HELD-OUT index ranges (train/eval contamination guard): the model
    // trains on entities [10000, 10000+n) and tunes its per-relation
    // thresholds on training + a DISJOINT validation range [20000,
    // 20000+n); the e2e P/R gates evaluate on [0, 150). No shipped weight
    // or threshold ever sees an evaluation entity (templates are still
    // shared — the generator IS the corpus language; noted in STATUS.md).
    def labeledFor(offset: Int) = {
      val (pages, gold) = graft.fixtures.PageGen.corpus(n, offset)
      // distant-supervision KB on the canonical relation name space
      val kb = gold.toSeq.map(g => (g.subj,
          Relations.fromString(g.pred).map(_.name).getOrElse(g.pred), g.obj))
        .toDF("subj", "pred", "obj")
      val sents = graft.pipeline.KGPipeline.sentences(spark,
        spark.createDataset(pages))
      val cands = sents.mapPartitions(
        _.flatMap(graft.extract.Candidates.fromSentence))
      Trainer.label(spark, cands, kb)
    }
    val labeledT = Trainer.thresholdFeatures(spark, labeledFor(10000)).cache()
    val tune = labeledT.unionByName(labeledFor(20000)).cache()
    val targets = labeledT.filter($"label" =!= "_NR")
      .select($"label").distinct().as[String].collect().toSeq.sorted
    val weights = Trainer.trainOneVsAll(spark,
      Trainer.subsampleNegatives(labeledT), targets,
      tuneOn = Some(tune))
    labeledT.unpersist(); tune.unpersist()
    Trainer.saveWeightsTsv(weights, out)
    val disabled = weights.count(_._2.threshold > 1.0)
    println(s"[train] wrote ${weights.size} relation models to $out " +
      s"($disabled rules-only)")
    spark.stop()
  }
}
