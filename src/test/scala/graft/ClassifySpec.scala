package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.classify.Classifiers
import graft.model.{Candidate, NER, Provenance, SlotFill}

class ClassifySpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val prov = Provenance("d", "u", 0, 0, 1, 2, 3)
  private def fill(subj: String, pred: String, obj: String, score: Double) =
    SlotFill(subj, NER.PERSON, pred, obj, NER.TITLE, score, prov)

  test("C7 gold classifier memorizes the key and answers on pair match") {
    val gold = Seq(("John Smith", "per:title", "engineer"))
      .toDF("subj", "pred", "obj")
    val cands = Seq(
      Candidate("John Smith", NER.PERSON, "engineer", "engineer", NER.TITLE,
        "u", "d", 0, 0, 2, 5, 6, Nil, Nil),
      Candidate("John Smith", NER.PERSON, "Paris", "Paris", NER.CITY,
        "u", "d", 0, 0, 2, 8, 9, Nil, Nil)).toDS()
    val out = Classifiers.goldClassifier(spark, gold)(cands).collect()
    assert(out.length == 1)
    assert(out.head.pred == "per:title" && out.head.score == 1.0)
  }

  test("C8 combination prefers the first model on key collision") {
    val a = Seq(fill("A", "per:title", "engineer", 0.9)).toDS()
    val b = Seq(fill("A", "per:title", "engineer", 0.2),
      fill("B", "per:title", "lawyer", 0.7)).toDS()
    val out = Classifiers.combine(spark, a, b).collect()
    assert(out.length == 2)
    assert(out.find(_.subj == "A").get.score == 0.9)
  }

  test("C6 ensemble keeps strict-majority fills with mean score") {
    val m1 = Seq(fill("A", "per:title", "engineer", 0.8),
      fill("B", "per:title", "lawyer", 0.6)).toDS()
    val m2 = Seq(fill("A", "per:title", "engineer", 0.6)).toDS()
    val m3 = Seq(fill("C", "per:title", "editor", 0.9)).toDS()
    val out = Classifiers.ensemble(spark, Seq(m1, m2, m3)).collect()
    assert(out.length == 1) // only A appears in 2 of 3 models
    assert(out.head.subj == "A" && math.abs(out.head.score - 0.7) < 1e-9)
  }

  test("C4 perceptron learns a separable trigger; C3 at-least-once bags") {
    import graft.classify.Perceptron
    val rels = Seq("per:title")
    // separable: trigger=per:title marks positives
    val pos = (0 until 40).map(_ =>
      ("per:title", Seq("trigger=per:title", "arg2type=TITLE")))
    val neg = (0 until 40).map(_ =>
      ("_NR", Seq("between_uni=met", "arg2type=TITLE")))
    val labeled = (pos ++ neg).toDF("label", "features")
    val w = Perceptron.train(spark, labeled, rels, epochs = 3)
    assert(Perceptron.predict(w, rels,
      Seq("trigger=per:title", "arg2type=TITLE")) == "per:title")
    assert(Perceptron.predict(w, rels,
      Seq("between_uni=met", "arg2type=TITLE")) == "_NR")
    // C3: the bag asserts the relation iff at least one mention does
    val bagHit = Perceptron.atLeastOnce(w, rels, Seq(
      Seq("between_uni=met"), Seq("trigger=per:title")))
    assert(bagHit.contains("per:title"))
    val bagMiss = Perceptron.atLeastOnce(w, rels, Seq(
      Seq("between_uni=met")))
    assert(!bagMiss.contains("per:title"))
  }

  test("C9 Bayes rescoring divides by the relation's conditional prior") {
    import graft.evaluate.Probabilities
    // the per-type priors partition the prior mass
    assert(math.abs(graft.model.Relations.all.map(_.prior).sum -
      (Probabilities.ofRelationTypePERSON +
        Probabilities.ofRelationTypeORGANIZATION)) < 1e-12)
    // rare relations are boosted relative to common ones
    val common = Probabilities.ofSlotValueGivenRelationAndEntity(0.5,
      "org:top_members/employees") // prior 0.0907
    val rare = Probabilities.ofSlotValueGivenRelationAndEntity(0.5,
      "per:siblings") // prior 1e-99
    assert(rare > common)
    val scored = Seq(("A", "per:title", "x", 0.5))
      .toDF("subj", "pred", "obj", "score")
    val out = Probabilities.rescore(scored).select("score")
      .collect()(0).getDouble(0)
    assert(math.abs(out - 0.5 / Probabilities.ofRelationGivenEntity(
      "per:title")) < 1e-9)
  }

  test("K2 curve writer emits the P/R curve csv") {
    val scored = Seq(("A", "per:title", "engineer", 0.9),
      ("B", "per:title", "lawyer", 0.4)).toDF("subj", "pred", "obj", "score")
    val gold = Seq(("A", "per:title", "engineer")).toDF("subj", "pred", "obj")
    val sweep = graft.evaluate.Evaluate.thresholdSweep(spark, scored, gold)
    val dir = java.nio.file.Files.createTempDirectory("graft-curve")
      .toString + "/curve"
    graft.evaluate.Evaluate.writeCurve(sweep, dir)
    val files = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".csv"))
    assert(files.nonEmpty)
    val lines = scala.io.Source.fromFile(files.head).getLines().toSeq
    assert(lines.head == "threshold,precision,recall,f1")
    assert(lines.length >= 3)
  }
}
