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

  /** Frozen TRAINED model (K3): rel -> hashed-feature binary LR with a
   *  per-relation threshold, trained in-sandbox on synthetic distant
   *  supervision (graft.tools.TrainFreeze) and shipped as a classpath
   *  resource — the reference ships serialized classifiers the same way
   *  (classify/RelationClassifier.java:94-107). The hand-derived trigger
   *  weights above remain the fallback when the resource is absent. */
  lazy val frozen: Map[String, graft.train.Trainer.FrozenLR] =
    Option(getClass.getResourceAsStream("/graft/lr_weights.tsv"))
      .map(graft.train.Trainer.loadFrozen).getOrElse(Map.empty)

  // same hash family the trainer used (HashingTF murmur3, fixed seed) —
  // one shared instance per executor JVM
  private lazy val hasher = new org.apache.spark.ml.feature.HashingTF()
    .setNumFeatures(graft.train.Trainer.NumFeatures)

  /** (probability, decision threshold) for one relation: frozen trained LR
   *  when shipped, hand-set fallback otherwise. `hashed` carries the
   *  feature hashes computed ONCE per mention (41 relations share them —
   *  re-hashing per relation was a measured hot spot). */
  def lrScoreAndThreshold(rel: String, features: Seq[String],
                          hashed: Array[Int] = null): (Double, Double) =
    frozen.get(rel) match {
      case Some(m) =>
        var s = m.intercept
        val hs = if (hashed != null) hashed else hashFeatures(features)
        var i = 0
        while (i < hs.length) {
          s += m.weights.getOrElse(hs(i), 0.0)
          i += 1
        }
        (sigmoid(s), m.threshold)
      case None => (lrScore(rel, features), Threshold)
    }

  def hashFeatures(features: Seq[String]): Array[Int] = {
    val out = new Array[Int](features.length)
    var i = 0
    features.foreach { f => out(i) = hasher.indexOf(f); i += 1 }
    out
  }

  /** X5 stop-sets (ConformToGuidelinesFilter,
   *  HeuristicSlotfillPostProcessors.java:167-186): between-span phrases
   *  that invalidate a top-employee / org-alt-name justification. */
  val invalidTopEmployeeJustification: Set[String] = Set(
    "spokesperson", "spokesman", "spokeswoman", "chief customer officer",
    "cco", "information officer", "chief compliance officer", "frontman",
    "secretary of information", "supreme court justice",
    "house minority leader", "press secretary", "representative",
    "senior advisor", "senior editor", "member")
  val invalidOrgAltNames: Set[String] = Set("association", "society",
    "group", "corporation", "corp", "corp.", "llc")

  private val foundedWords = Set("founded", "founder", "created", "creator")
  private val birthRewrite = Map(
    "per:city_of_birth" -> "per:cities_of_residence",
    "per:stateorprovince_of_birth" -> "per:stateorprovinces_of_residence",
    "per:country_of_birth" -> "per:countries_of_residence")
  private def isBirthWord(w: String) = w == "born" || w.contains("birth") ||
    w.contains("origin") || w == "from" || w.contains("native")
  private def isResidenceWord(w: String) = w.startsWith("reside") ||
    w.startsWith("live") || w.contains("home") || w.startsWith("raise") ||
    w.contains("brought")

  /** Between-window rewrites/filters applied per scored mention — the
   *  reference's X5 stop-sets + X10 TopEmployeeRewrite
   *  (HeuristicSlotfillPostProcessors.java:425-449) + X11 BornInRewrite
   *  (:453-499), run where the between-window is already computed
   *  (post-classification in the reference; per-mention here, upstream of
   *  the bag aggregation that would discard the window). */
  def betweenPass(c: Candidate, scored: Seq[(String, Double)])
      : Seq[(String, Double)] = {
    lazy val betweenText = c.between.mkString(" ")
    scored.flatMap { case (rel, p) =>
      rel match {
        case "org:top_members/employees" =>
          if (invalidTopEmployeeJustification.contains(betweenText)) None
          else if (c.between.exists(foundedWords)) Some("org:founded_by" -> p)
          else Some(rel -> p)
        case "org:alternate_names"
          if invalidOrgAltNames.contains(betweenText) => None
        case r if birthRewrite.contains(r) =>
          if (c.between.exists(isBirthWord)) Some(rel -> p)
          else if (c.between.exists(isResidenceWord))
            Some(birthRewrite(r) -> p)
          else if (c.between.length < 8) Some(rel -> p)
          else None // very little support for a distant birth-place claim
        case _ => Some(rel -> p)
      }
    }
  }

  /** Score one candidate mention: pattern hits at 1.0, plus LR labels with
   *  p > threshold (type-gated), then the between-window pass. */
  def score(c: Candidate): Seq[(String, Double)] = {
    val ruleHits = c.features.iterator.filter(_.startsWith("rule="))
      .map(_.substring("rule=".length)).toSet
    val typed = Relations.all.iterator.filter { m =>
      m.entityType == c.subj_type && m.validSlotTypes.contains(c.obj_type)
    }
    val hashed = if (frozen.nonEmpty) hashFeatures(c.features) else null
    betweenPass(c, typed.flatMap { m =>
      if (ruleHits.contains(m.name)) Some(m.name -> 1.0)
      else {
        val (p, thr) = lrScoreAndThreshold(m.name, c.features, hashed)
        if (p > thr) Some(m.name -> p) else None
      }
    }.toSeq)
  }

  def toFills(c: Candidate): Seq[SlotFill] = {
    val prov = Provenance(c.doc_id, c.url, c.sent_idx, c.ent_b, c.ent_e,
      c.slot_b, c.slot_e)
    score(c).map { case (rel, p) =>
      SlotFill(c.subj, c.subj_type, rel, c.obj, c.obj_type, p, prov)
    }
  }
}
