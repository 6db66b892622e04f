package graft.extract

import graft.model.{Candidate, Relations, SlotFill, Provenance}

/**
 * Per-mention relation scoring: featurized one-vs-all logistic regression
 * with shipped weights, unioned with the pattern extractor.
 *
 * LR shape follows OneVsAllRelationExtractor inference
 * (classify/OneVsAllRelationExtractor.java:76-139): per relation a binary
 * LR over the sparse string features; per mention keep labels with p>0.5;
 * rule hits score 1.0 and take precedence
 * (classify/HeuristicRelationExtractor.java:23-77,
 * evaluate/SimpleSlotFiller.java:257-279).
 *
 * Weights are deterministic and derived from the trigger lexicon (frozen
 * "shipped model" — the reference ships serialized classifiers the same
 * way; SURVEY.md §7 M3). Broadcast as a Map — never shuffled.
 */
object Scorer {

  val Threshold = 0.50 // Props.java:495-501 default slot threshold

  /** rel -> (feature -> weight); bias under key "__bias__". */
  val weights: Map[String, Map[String, Double]] =
    Relations.all.map { meta =>
      val w = Map.newBuilder[String, Double]
      w += ("__bias__" -> -4.0)
      w += (s"trigger=${meta.name}" -> 3.2)
      w += (s"arg1type=${meta.entityType}" -> 0.4)
      // only the PRIMARY slot type crosses the decision boundary: the broad
      // validNamedEntityLabels set (e.g. STATE for per:city_of_birth) is an
      // acceptance gate, not evidence
      w += (s"arg2type=${meta.primarySlotType}" -> 0.8)
      // mild distance prior: nearer pairs are likelier relation mentions
      w += ("dist_bin=0" -> 0.1); w += ("dist_bin=1" -> 0.05)
      meta.name -> w.result()
    }.toMap

  def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  def lrScore(rel: String, features: Seq[String]): Double = {
    val w = weights(rel)
    var s = w("__bias__")
    features.foreach(f => s += w.getOrElse(f, 0.0))
    sigmoid(s)
  }

  /** Score one candidate mention: pattern hits at 1.0, plus LR labels with
   *  p > threshold (type-gated). Returns (relation, score) pairs. */
  def score(c: Candidate): Seq[(String, Double)] = {
    val ruleHits = c.features.iterator.filter(_.startsWith("rule="))
      .map(_.substring("rule=".length)).toSet
    val typed = Relations.all.iterator.filter { m =>
      m.entityType == c.subj_type && m.validSlotTypes.contains(c.obj_type)
    }
    typed.map { m =>
      if (ruleHits.contains(m.name)) m.name -> 1.0
      else m.name -> lrScore(m.name, c.features)
    }.filter(_._2 > Threshold).toSeq
  }

  def toFills(c: Candidate): Seq[SlotFill] = {
    val prov = Provenance(c.doc_id, c.url, c.sent_idx, c.ent_b, c.ent_e,
      c.slot_b, c.slot_e)
    score(c).map { case (rel, p) =>
      SlotFill(c.subj, c.subj_type, rel, c.obj, c.obj_type, p, prov)
    }
  }
}
