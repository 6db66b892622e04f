package graft.classify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * C4 PerceptronExtractor (classify/PerceptronExtractor.java, LabelWeights
 * `classify/HoffmannExtractor.java:26-110`): multiclass perceptron over
 * sparse string features with averaging, re-expressed for Spark as
 * ITERATIVE PARAMETER MIXING (per-partition perceptron passes, weights
 * averaged across partitions each epoch — McDonald et al. 2010, the
 * standard distributed-perceptron scheme): no single-node pass over the
 * corpus, and the model (vocab-bounded after the F4 threshold) is the only
 * thing that crosses the wire.
 *
 * C3 HoffmannExtractor's inference is AT-LEAST-ONCE multi-instance
 * aggregation: a bag asserts a relation iff its best mention does —
 * `atLeastOnce` below; pair it with these weights for the MultiR shape.
 */
object Perceptron {

  val NR = "_NR" // the no-relation label

  type Weights = Map[String, Map[String, Double]] // rel -> feature -> w

  def score(w: Weights, rel: String, features: Seq[String]): Double = {
    val wr = w.getOrElse(rel, Map.empty)
    var s = 0.0
    features.foreach(f => s += wr.getOrElse(f, 0.0))
    s
  }

  def predict(w: Weights, rels: Seq[String], features: Seq[String]): String =
    (rels :+ NR).maxBy(r => (score(w, r, features), r))

  /** One local perceptron pass over an iterator of (label, features),
   *  starting from `init`; returns the pass's final weights. */
  def localPass(init: Weights, rels: Seq[String],
                data: Iterator[(String, Seq[String])]): Weights = {
    val w = scala.collection.mutable.HashMap[(String, String), Double]()
    init.foreach { case (r, fs) =>
      fs.foreach { case (f, v) => w((r, f)) = v }
    }
    def bump(rel: String, fs: Seq[String], by: Double): Unit =
      fs.foreach { f =>
        val k = (rel, f)
        w(k) = w.getOrElse(k, 0.0) + by
      }
    data.foreach { case (gold, fs) =>
      var bestR = NR
      var bestS = Double.NegativeInfinity
      (rels :+ NR).foreach { r =>
        var s = 0.0
        fs.foreach(f => s += w.getOrElse((r, f), 0.0))
        if (s > bestS || (s == bestS && r > bestR)) { bestS = s; bestR = r }
      }
      if (bestR != gold) {
        if (gold != NR) bump(gold, fs, 1.0)
        if (bestR != NR) bump(bestR, fs, -1.0)
      }
    }
    w.iterator.toSeq.groupBy(_._1._1).map { case (r, rows) =>
      r -> rows.map { case ((_, f), v) => f -> v }.toMap
    }
  }

  /** Distributed training: per epoch, each partition runs one local pass
   *  from the broadcast weights; non-empty partitions' final weights are
   *  averaged (iterative parameter mixing) into the next epoch's model. */
  def train(spark: SparkSession, labeled: DataFrame, rels: Seq[String],
            epochs: Int = 3): Weights = {
    import spark.implicits._
    val data = labeled.select(col("label"),
      col("features").cast("array<string>"))
      .as[(String, Seq[String])].cache()
    var w: Weights = Map.empty
    for (_ <- 1 to epochs) {
      val bw = spark.sparkContext.broadcast(w)
      // marker row per non-empty partition -> exact mixing denominator
      val partial = data.mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else Iterator.single(("__part__", "", 1.0)) ++
          localPass(bw.value, rels, it).iterator.flatMap {
            case (r, fs) => fs.iterator.map { case (f, v) => (r, f, v) }
          }
      }.toDF("rel", "f", "v")
      val rows = partial.groupBy($"rel", $"f").agg(sum($"v").as("v"))
        .as[(String, String, Double)].collect()
      val nParts = math.max(1.0, rows.find(_._1 == "__part__").map(_._3)
        .getOrElse(1.0))
      w = rows.filter(_._1 != "__part__").groupBy(_._1).map {
        case (r, rs) => r -> rs.map(t => t._2 -> t._3 / nParts).toMap
      }
    }
    data.unpersist()
    w
  }

  /** C3 at-least-once inference (HoffmannExtractor): the bag's score for a
   *  relation is its BEST mention's margin; the bag asserts the relation
   *  iff that mention predicts it (max-aggregation over the bag). */
  def atLeastOnce(w: Weights, rels: Seq[String],
                  bag: Seq[Seq[String]]): Map[String, Double] =
    rels.flatMap { r =>
      val hits = bag.filter(fs => predict(w, rels, fs) == r)
      if (hits.isEmpty) None
      else Some(r -> hits.map(fs => score(w, r, fs)).max)
    }.toMap
}
