package graft.consistency

import graft.model.{NER, Relations, SlotFill}
import graft.nlp.{Coref, Gazetteers}

/**
 * Consistency filters & rewrites X1-X18 (SURVEY.md §2.8), the relational
 * heart of the reference's evaluate/ package:
 * SlotfillPostProcessor.java:17-195 (composition),
 * HeuristicSlotfillPostProcessors.java (the individual checks),
 * WorldKnowledgePostProcessor.java (geo).
 *
 * Two passes, mirroring the reference's unary + global split
 * (SimpleSlotFiller.java:286-309, InferentialSlotFiller.java:143-161):
 *  - `unary`: per-fill filter/rewrite — embarrassingly parallel, row-local.
 *  - `entityPass`: pairwise / hold-one-out checks within one entity's fill
 *    set — a pure Seq->Seq function applied per entity partition
 *    (groupByKey(subj) upstream); groups are small by construction, hot
 *    entities are bounded by the argmax/dedup semantics themselves.
 */
object Consistency {

  private val deathLocPreds = Set("per:city_of_death",
    "per:stateorprovince_of_death", "per:country_of_death")
  private val countryPreds = Set("per:country_of_birth",
    "per:country_of_death", "per:countries_of_residence",
    "org:country_of_headquarters")
  private val datePredsNoYearOk = Set("per:date_of_death", "org:dissolved")
  /** X5 invalid-title stop-set (ConformToGuidelinesFilter,
   *  HeuristicSlotfillPostProcessors.java:180-186,223). */
  private val invalidTitles = Set("senior leader", "leader", "member",
    "hero", "socialite")
  /** The X12 geo suite (region-containment hierarchy, canonicalizers,
   *  population-weighted entailment) — WorldKnowledgePostProcessor.java. */
  val geo: WorldKnowledge = WorldKnowledge.default

  private val statePreds = Set("per:stateorprovince_of_birth",
    "per:stateorprovince_of_death", "per:stateorprovinces_of_residence",
    "org:stateorprovince_of_headquarters")
  private val cityPreds = Set("per:city_of_birth", "per:city_of_death",
    "per:cities_of_residence", "org:city_of_headquarters")

  /** Character 4-gram overlap used by FilterUnrelatedURL
   *  (HeuristicSlotfillPostProcessors.java:255-295). */
  def ngramOverlap(a: String, b: String, n: Int = 4): Boolean = {
    val la = a.toLowerCase.filter(_.isLetterOrDigit)
    val lb = b.toLowerCase.filter(_.isLetterOrDigit)
    if (la.length < n || lb.length < n) false
    else la.sliding(n).exists(g => lb.contains(g))
  }

  /** X1, X2, X4, X5, X7, X12-unary: per-fill validate-and-rewrite.
   *  Returns None to kill the fill. */
  def unaryOne(f: SlotFill): Option[SlotFill] = {
    val meta = Relations.byName.get(f.pred)
    if (meta.isEmpty) return None
    val m = meta.get
    // X2 RespectRelationTypes (:45-86)
    if (m.entityType != f.subj_type) return None
    if (!m.validSlotTypes.contains(f.obj_type)) return None
    // X7 FilterVeryLowProbabilitySlots (:137-143)
    if (f.score < 0.01) return None
    // X4 SanityCheckFilter (:146-162)
    if (f.obj.length > 80) return None
    if (f.obj.equalsIgnoreCase(f.subj)) return None
    if (f.pred == "per:age") {
      val age = f.obj.takeWhile(_.isDigit)
      if (age.isEmpty) return None
      val a = age.toLong
      if (a <= 0 || a > 125) return None
    }
    var fill = f
    // X5 ConformToGuidelines (:165-248): date fills must carry a 4-digit
    // year (except death/dissolved); pad partial timex values
    if (m.isDateRelation) {
      val o = fill.obj
      val padded =
        if (o.matches("\\d{4}")) o + "-XX-XX"
        else if (o.matches("\\d{4}-\\d{2}")) o + "-XX"
        else o
      fill = fill.copy(obj = padded)
      val hasYear = padded.matches("\\d{4}.*")
      if (!hasYear && !datePredsNoYearOk.contains(fill.pred)) return None
      if (padded.contains("/") || padded.toLowerCase.contains(" to "))
        return None // no ranges
    }
    // X12 unary rewrite: nationality adjective -> country name for country
    // relations (WorldKnowledgePostProcessor canonical renames :56-111)
    if (countryPreds.contains(fill.pred))
      Gazetteers.nationalities.get(fill.obj).foreach { c =>
        fill = fill.copy(obj = c, obj_type = NER.COUNTRY)
      }
    // X12 canonical country renames (WorldKnowledgePostProcessor alternate-
    // name + country-code tables, :286-299): abbreviated/alternate country
    // surfaces -> gazetteer-canonical display names
    if (fill.obj_type == NER.COUNTRY)
      geo.countryRename(fill.obj).foreach(c => fill = fill.copy(obj = c))
    // X12 region-CODE canonical rename ("CA" -> "California";
    // canonicalizeRegion's code2region path, :280-289)
    if (fill.obj_type == NER.STATE_OR_PROVINCE || statePreds.contains(fill.pred))
      geo.regionCodeRename(fill.obj).foreach(r => fill = fill.copy(obj = r))
    // X12 city-abbreviation rename ("NYC" -> "New York"; abbrv2city, :270)
    if (cityPreds.contains(fill.pred))
      geo.cityAbbrevRename(fill.obj).foreach(c => fill = fill.copy(obj = c))
    // X5 invalid-title stop-set (:223)
    if (fill.pred == "per:title" &&
        invalidTitles.contains(fill.obj.toLowerCase)) return None
    // per:origin: nationality kept as-is (valid fill type)
    // X1 FilterUnrelatedURL (:255-295)
    if (fill.pred == "org:website") {
      val base = fill.obj.replaceAll("^(https?://[^/]+).*$", "$1")
      fill = fill.copy(obj = base)
      if (!ngramOverlap(fill.subj, fill.obj)) return None
    }
    Some(fill)
  }

  /** KBPSlotFill.compareTo ordering (common/KBPSlotFill.java:58-80):
   *  score desc, longer slot value, longer entity name, lexicographic. */
  val fillOrdering: Ordering[SlotFill] = Ordering.fromLessThan { (a, b) =>
    if (a.score != b.score) a.score > b.score
    else if (a.obj.length != b.obj.length) a.obj.length > b.obj.length
    else if (a.subj.length != b.subj.length) a.subj.length > b.subj.length
    else {
      val c = (a.pred + a.obj).compareTo(b.pred + b.obj)
      c < 0
    }
  }

  /** Representatives scanned per (pred) group in X14's approximate-dup
   *  check: bounds a degenerate entity with 10^5+ DISTINCT same-pred fills
   *  to a linear pass (beyond the cap, fills are kept — recall-safe). */
  val MaxApproxScan = 256

  /** X13-X18 + X12-pairwise: within-entity global pass. Pure function of one
   *  entity's fills (already unary-filtered), deterministic order.
   *
   *  Runs AFTER entity linking, grouped by CANONICAL subject — the
   *  reference applies slotfill post-processing per canonical entity
   *  (InferentialSlotFiller.java:122-165: merge -> symmetric -> pass 2) —
   *  so a canonical entity assembled from two surface forms cannot carry
   *  conflicting SINGLE-cardinality fills.
   *
   *  Every check is hash-map based (single sorted pass, no quadratic
   *  accumulator scans): a hot subject with 10^5-10^6 fills is one LINEAR
   *  task, not a 10^10-comparison straggler. */
  def entityPass(fillsIn: Seq[SlotFill]): Seq[SlotFill] = {
    val sorted = fillsIn.sorted(fillOrdering)

    // X13 NoDuplicates (:506-515): exact (pred, obj) dedup, keep best
    // score (first in sorted order)
    val x13seen = scala.collection.mutable.HashSet[(String, String)]()
    var fills = sorted.filter(f => x13seen.add((f.pred, f.obj)))

    // X13b: per:employee_of dies if same obj exists under per:member_of
    val memberObjs = fills.iterator
      .filter(_.pred == "per:member_of").map(_.obj).toSet
    if (memberObjs.nonEmpty)
      fills = fills.filterNot(f =>
        f.pred == "per:employee_of" && memberObjs.contains(f.obj))

    // X14 NoDuplicatesApproximate (:518-573): same pred, two objs that link
    // as the same entity -> kill the lower-scoring one (compare against the
    // accumulated survivors of the SAME pred, scan capped for degeneracy)
    val survivors = scala.collection.mutable.HashMap[String,
      scala.collection.mutable.ArrayBuffer[String]]()
    fills = fills.filter { f =>
      val objs = survivors.getOrElseUpdate(f.pred,
        scala.collection.mutable.ArrayBuffer[String]())
      val dup = objs.iterator.take(MaxApproxScan)
        .exists(o => o != f.obj && sameValue(o, f.obj))
      if (!dup) objs += f.obj
      !dup
    }

    // X15 DuplicateRelationOnlyInListRelations (:576-598): SINGLE relations
    // keep only the top fill (argmax per (entity, pred))
    val singleSeen = scala.collection.mutable.HashSet[String]()
    fills = fills.filter(f =>
      !Relations.singleValued.contains(f.pred) || singleSeen.add(f.pred))

    // X16 RespectDeclaredIncompatibilities (:610-625): same obj under two
    // preds -> lower dies unless plausiblyCooccursWith every kept pred
    val objPreds = scala.collection.mutable.HashMap[String, List[String]]()
    fills = fills.filter { f =>
      val ps = objPreds.getOrElse(f.obj, Nil)
      val clash = ps.exists(p => p != f.pred &&
        !Relations.plausibleOverlap.contains((p, f.pred)))
      if (!clash) objPreds(f.obj) = f.pred :: ps
      !clash
    }

    // X18 RemoveLowWeightRelationUnlessOnlyOneOfType (:601-607): keep if
    // score >= 0.01 or f is its pred's best (sorted order: first per pred).
    // NOTE: unreachable after X7's unary score<0.01 kill — kept because the
    // reference layers it the same way (X7 runs in the unary chain, X18 in
    // the global chain) and because X18 must still hold if a caller runs
    // entityPass on fills that skipped the unary pass.
    val bestScore = scala.collection.mutable.HashMap[String, Double]()
    fills.foreach(f =>
      if (!bestScore.contains(f.pred)) bestScore(f.pred) = f.score)
    fills = fills.filter(f => f.score >= 0.01 || f.score >= bestScore(f.pred))

    // X17 MitigateLocOfDeath (:636-655): location-of-death requires a
    // per:date_of_death fill
    val hasDod = fills.exists(_.pred == "per:date_of_death")
    fills = fills.filter(f => !deathLocPreds.contains(f.pred) || hasDod)

    // X12 pairwise geo containment (WorldKnowledgePostProcessor.java:
    // 474-520 pairwiseKeepLowerScoringFill + :344-349 consistentGeography):
    // within each geo family (birth / death / residence / headquarters),
    // fills are processed in fillOrdering (score) order; a fill whose
    // city-region / city-country / region-country containment CONTRADICTS
    // any higher-ranked kept fill of its family dies — the reference kills
    // the lower-scoring side of an inconsistent pair. The scan per family
    // is capped like X14's (hot residence lists stay linear). Gazetteer
    // misses pass (fail-open — see WorldKnowledge scaladoc).
    fills = geoPairwise(fills)

    fills
  }

  /** Fill count above which the Gibbs variant (quadratic per entity, like
   *  the reference's) falls back to the linear greedy entityPass. */
  val MaxGibbsFills = 512

  /** Symmetric can-these-two-fills-coexist predicate — the pairwise checks
   *  entityPass applies sequentially (X13/X13b/X14/X15/X16 + X12-geo), as
   *  one predicate for the Gibbs variant's consistency test
   *  (HeuristicSlotfillPostProcessor.blockGibbsCanTransition → isConsistent,
   *  HeuristicSlotfillPostProcessor.java:66-118). */
  def pairConsistent(a: SlotFill, b: SlotFill): Boolean = {
    if (a.pred == b.pred) {
      if (a.obj == b.obj) return false                           // X13
      if (Relations.singleValued.contains(a.pred)) return false  // X15
      if (sameValue(a.obj, b.obj)) return false                  // X14
    } else if (a.obj == b.obj) {
      // X13b employee_of vs member_of on one obj: employee side dies
      if ((a.pred == "per:employee_of" && b.pred == "per:member_of") ||
          (b.pred == "per:employee_of" && a.pred == "per:member_of"))
        return false
      // X16 (plausibleOverlap is stored symmetric)
      if (!Relations.plausibleOverlap.contains((a.pred, b.pred)))
        return false
    }
    // X12 pairwise geo containment within one family
    (geoRole.get(a.pred), geoRole.get(b.pred)) match {
      case (Some((fa, ra)), Some((fb, rb))) if fa == fb =>
        geoConsistentPair(ra, a.obj, rb, b.obj)
      case _ => true
    }
  }

  /** Gibbs-sampling consistency variant (HeuristicSlotfillPostProcessor
   *  .filterStep "pass 2", Props.GibbsObjective.SUM with
   *  test.consistency.mixingtime restarts, Props.java:246-250) — OFF by
   *  default in the reference (the default TOP objective IS the greedy
   *  pass, which `entityPass` implements); shipped for parity, not wired
   *  into the pipeline default.
   *
   *  Seeded-random restarts (Random(42), like the reference) of randomized
   *  greedy enabling under `pairConsistent`; keeps the assignment with the
   *  highest SUM of active scores. The sorted greedy assignment seeds the
   *  argmax, so the variant never returns a lower-objective set than
   *  greedy. Quadratic per entity like the reference's — above
   *  `MaxGibbsFills` it falls back to the linear `entityPass` (a hot
   *  canonical subject must never become an O(n²·mixingTime) straggler). */
  def entityPassGibbs(fillsIn: Seq[SlotFill],
                      mixingTime: Int = 10): Seq[SlotFill] = {
    if (fillsIn.lengthCompare(MaxGibbsFills) > 0) return entityPass(fillsIn)
    val sorted = fillsIn.sorted(fillOrdering).toArray
    val n = sorted.length
    if (n == 0) return Nil
    def enable(order: Seq[Int]): Array[Boolean] = {
      val active = new Array[Boolean](n)
      order.foreach { i =>
        var ok = true
        var j = 0
        while (ok && j < n) {
          if (active(j) && j != i && !pairConsistent(sorted(j), sorted(i)))
            ok = false
          j += 1
        }
        if (ok) active(i) = true
      }
      active
    }
    def objective(a: Array[Boolean]): Double = {
      var s = 0.0; var i = 0
      while (i < n) { if (a(i)) s += sorted(i).score; i += 1 }
      s
    }
    var best = enable(0 until n) // pass 1: greedy in fillOrdering order
    var bestObj = objective(best)
    val rand = new scala.util.Random(42)
    var r = 0
    while (r < mixingTime) {
      val cand = enable(rand.shuffle((0 until n).toList))
      val obj = objective(cand)
      if (obj > bestObj) { bestObj = obj; best = cand }
      r += 1
    }
    val kept = (0 until n).iterator.filter(best).map(sorted).toSeq
    // X17 is existential, not pairwise — applies to whichever set won
    val hasDod = kept.exists(_.pred == "per:date_of_death")
    kept.filter(f => !deathLocPreds.contains(f.pred) || hasDod)
  }

  /** (family index, role) per geo pred; roles: 0=city, 1=region, 2=country. */
  private val geoFamilies: Seq[(String, String, String)] = Seq(
    ("per:city_of_birth", "per:stateorprovince_of_birth",
      "per:country_of_birth"),
    ("per:city_of_death", "per:stateorprovince_of_death",
      "per:country_of_death"),
    ("per:cities_of_residence", "per:stateorprovinces_of_residence",
      "per:countries_of_residence"),
    ("org:city_of_headquarters", "org:stateorprovince_of_headquarters",
      "org:country_of_headquarters"))
  private val geoRole: Map[String, (Int, Int)] =
    geoFamilies.zipWithIndex.flatMap { case ((c, s, y), i) =>
      Seq(c -> (i, 0), s -> (i, 1), y -> (i, 2))
    }.toMap

  private def geoConsistentPair(roleA: Int, a: String,
                                roleB: Int, b: String): Boolean =
    (roleA, roleB) match {
      case (0, 1) => geo.consistentCityRegion(a, b)
      case (1, 0) => geo.consistentCityRegion(b, a)
      case (0, 2) => geo.consistentCityCountry(a, b)
      case (2, 0) => geo.consistentCityCountry(b, a)
      case (1, 2) => geo.consistentRegionCountry(a, b)
      case (2, 1) => geo.consistentRegionCountry(b, a)
      case _ => true // same role: duplicates are X13/X14's job
    }

  private def geoPairwise(fills: Seq[SlotFill]): Seq[SlotFill] = {
    val kept = scala.collection.mutable.HashMap[Int,
      scala.collection.mutable.ArrayBuffer[(Int, String)]]()
    fills.filter { f =>
      geoRole.get(f.pred) match {
        case None => true
        case Some((fam, role)) =>
          val others = kept.getOrElseUpdate(fam,
            scala.collection.mutable.ArrayBuffer[(Int, String)]())
          val ok = others.iterator.take(MaxApproxScan).forall {
            case (r2, v2) => geoConsistentPair(role, f.obj, r2, v2)
          }
          if (ok) others += ((role, f.obj))
          ok
      }
    }
  }

  /** EntityLinker.sameEntity-lite for slot values
   *  (HeuristicSlotfillPostProcessors.java:518-573 +
   *  entitylinking/EntityLinker.java:80-175): exact (case-insensitive),
   *  acronym, or approximate-token containment. */
  def sameValue(a: String, b: String): Boolean = {
    if (a.equalsIgnoreCase(b)) return true
    val ta = a.split(" ").toSeq
    val tb = b.split(" ").toSeq
    if (Coref.isAcronymOf(a, tb) || Coref.isAcronymOf(b, ta)) return true
    // token containment with approximate matching (last-name reference etc.)
    val (small, large) = if (ta.length <= tb.length) (ta, tb) else (tb, ta)
    small.nonEmpty && small.forall(s =>
      large.exists(l => Coref.approxTokenMatch(s, l)))
  }
}
