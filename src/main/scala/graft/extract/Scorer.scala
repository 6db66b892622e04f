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

  /** Inverted CSR view of the whole frozen one-vs-all model: ONE probe per
   *  FEATURE returns every (relation, weight) pair carrying that feature,
   *  so a candidate costs |features| probes instead of
   *  |relations|×|features| IntMap walks (the former inference hot spot in
   *  executor stack samples). Scores are bit-identical to the per-relation
   *  form: each relation's partial sums still accumulate in feature order,
   *  one add per (feature, relation) weight, intercept first. */
  private final class InvertedLR(models: Map[String, graft.train.Trainer.FrozenLR]) {
    val relNames: Array[String] = models.keys.toArray.sorted
    val nRels: Int = relNames.length
    private val relIdx: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](nRels * 2)
      var i = 0; while (i < nRels) { m.put(relNames(i), i); i += 1 }; m
    }
    val intercepts: Array[Double] = relNames.map(models(_).intercept)
    val thresholds: Array[Double] = relNames.map(models(_).threshold)

    // open-addressed feature table + CSR payload: for each distinct
    // feature id, a contiguous [start, end) run of (relation index, weight)
    private var slotStart: Array[Int] = _
    private var slotEnd: Array[Int] = _
    private var csrRel: Array[Int] = _
    private var csrW: Array[Double] = _
    private var mask: Int = _
    private val hashKeys: Array[Int] = {
      val byFeat = scala.collection.mutable.LongMap.empty[List[(Int, Double)]]
      var r = 0
      while (r < nRels) {
        models(relNames(r)).weights.foreach { case (f, w) =>
          byFeat(f.toLong) = (r, w) :: byFeat.getOrElse(f.toLong, Nil)
        }
        r += 1
      }
      val nKeys = byFeat.size
      var cap = 16
      while (cap < nKeys * 2) cap <<= 1
      val keys = Array.fill(cap)(-1)
      slotStart = new Array[Int](cap)
      slotEnd = new Array[Int](cap)
      val nnz = byFeat.valuesIterator.map(_.size).sum
      csrRel = new Array[Int](nnz)
      csrW = new Array[Double](nnz)
      mask = cap - 1
      var pos = 0
      byFeat.foreach { case (fLong, pairs) =>
        val f = fLong.toInt
        var slot = scramble(f) & mask
        while (keys(slot) >= 0) slot = (slot + 1) & mask
        keys(slot) = f
        slotStart(slot) = pos
        pairs.foreach { case (ri, wi) =>
          csrRel(pos) = ri; csrW(pos) = wi; pos += 1
        }
        slotEnd(slot) = pos
      }
      keys
    }
    private def scramble(k: Int): Int = {
      // finalizer-style int mix (public-domain murmur3 fmix32 constants)
      var h = k * 0x85ebca6b
      h ^= h >>> 13
      h *= 0xc2b2ae35
      h ^ (h >>> 16)
    }

    def indexOf(rel: String): Int = {
      val i = relIdx.get(rel)
      if (i == null) -1 else i.intValue()
    }

    /** acc(r) = intercept(r) + Σ_{features} weight(r, f), feature order. */
    def scoreInto(hashed: Array[Int], acc: Array[Double]): Unit = {
      System.arraycopy(intercepts, 0, acc, 0, nRels)
      var i = 0
      while (i < hashed.length) {
        val f = hashed(i)
        var slot = scramble(f) & mask
        var k = hashKeys(slot)
        while (k >= 0 && k != f) { slot = (slot + 1) & mask; k = hashKeys(slot) }
        if (k == f) {
          var p = slotStart(slot)
          val e = slotEnd(slot)
          while (p < e) { acc(csrRel(p)) += csrW(p); p += 1 }
        }
        i += 1
      }
    }
  }

  private lazy val inverted: Option[InvertedLR] =
    if (frozen.nonEmpty) Some(new InvertedLR(frozen)) else None

  /** Per-JVM memo of feature-string -> murmur3 bucket: feature strings are
   *  themselves memoized per (family, word) in Candidates, so the same
   *  instances recur across candidates and String.hashCode is cached —
   *  a map hit is cheaper than re-running murmur3 over the bytes.
   *  Bound check runs ONLY on the miss path: ConcurrentHashMap.size()
   *  sums striped counter cells whose count grows with writer threads, so
   *  calling it per lookup anti-scales with executor parallelism. */
  private val hashMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile private var hashMemoFull = false

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
    features.foreach { f =>
      val hit = hashMemo.get(f)
      out(i) =
        if (hit != null) hit.intValue()
        else {
          val h = hasher.indexOf(f)
          if (!hashMemoFull) {
            hashMemo.put(f, Integer.valueOf(h))
            if (hashMemo.size > (1 << 20)) hashMemoFull = true
          }
          h
        }
      i += 1
    }
    out
  }

  /** Test hook: score every frozen relation for one feature list via the
   *  inverted CSR path (what `score` uses). Specs compare this against the
   *  per-relation IntMap walk (`lrScoreAndThreshold`) for bit-equality. */
  def scoreAllFrozen(features: Seq[String]): Map[String, Double] =
    inverted match {
      case Some(ix) =>
        val acc = new Array[Double](ix.nRels)
        ix.scoreInto(hashFeatures(features), acc)
        ix.relNames.zipWithIndex.map { case (r, i) => r -> sigmoid(acc(i)) }.toMap
      case None => Map.empty
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

  /** (entityType, slotType) -> the relations that gate pair: the 41-meta
   *  walk with two set probes ran per candidate though its result is a
   *  function of the tiny type-pair domain (r6, guide §1.2 step 2). */
  private val typedMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, String), Array[graft.model.RelationMeta]]()
  private def typedFor(subjType: String, objType: String): Array[graft.model.RelationMeta] = {
    val k = (subjType, objType)
    val hit = typedMemo.get(k)
    if (hit != null) hit
    else {
      val v = Relations.all.filter(m =>
        m.entityType == subjType && m.validSlotTypes.contains(objType)).toArray
      typedMemo.put(k, v)
      v
    }
  }

  /** Score one candidate mention: pattern hits at 1.0, plus LR labels with
   *  p > threshold (type-gated), then the between-window pass. */
  def score(c: Candidate): Seq[(String, Double)] = {
    // rule features are appended at the tail of the feature list and are
    // 0-2 per candidate: a tiny vector + linear contains beats a Set build
    val ruleHits: IndexedSeq[String] = {
      val b = Vector.newBuilder[String]
      c.features.foreach(f =>
        if (f.startsWith("rule=")) b += f.substring("rule=".length))
      b.result()
    }
    val typed = typedFor(c.subj_type, c.obj_type).iterator
    val acc = inverted match {
      case Some(ix) =>
        val a = new Array[Double](ix.nRels)
        ix.scoreInto(hashFeatures(c.features), a)
        a
      case None => null
    }
    betweenPass(c, typed.flatMap { m =>
      if (ruleHits.contains(m.name)) Some(m.name -> 1.0)
      else inverted match {
        case Some(ix) =>
          val ri = ix.indexOf(m.name)
          if (ri < 0) { // relation absent from the frozen TSV: fallback LR
            val p = lrScore(m.name, c.features)
            if (p > Threshold) Some(m.name -> p) else None
          } else {
            val p = sigmoid(acc(ri))
            if (p > ix.thresholds(ri)) Some(m.name -> p) else None
          }
        case None =>
          val p = lrScore(m.name, c.features)
          if (p > Threshold) Some(m.name -> p) else None
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
