package graft.extract

import graft.model.{Candidate, NER, Sentence}
import graft.nlp.Gazetteers

/**
 * Candidate (entity, slot) pair generation + surface featurization.
 *
 * RelationMentionAnnotator in ALL_PAIRS mode
 * (process/RelationMentionAnnotator.java:95-297): every PER/ORG mention is
 * an entity; every slot mention AND every other entity mention is a slot
 * candidate; pairs deduped per sentence on (entity, slotValue)
 * (`extractedPairs`, :109,176-183). Featurization = the surface families of
 * FeatureFactory.createDatum (process/FeatureFactory.java:98-613) with
 * doNotLexicalizeFirstArgument=true (process/KBPProcess.java:64), PLUS the
 * dependency families (FeatureFactory.java:654-760) over the deterministic
 * lite arc layer (nlp/DepLite.scala — no statistical parser in-sandbox;
 * the FAMILY semantics are the reference's, the arcs a POS-rule
 * approximation) — C1 weights are ours, so the feature basis is internal.
 *
 * Pure per-sentence function — runs in the same mapPartitions as the NLP
 * stage; no shuffle until bag aggregation.
 */
object Candidates {

  val MaxSentenceTokens = 150 // PreFeaturizerAnnotator.java:99 gate

  private def md5hex(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** F2 datum identity — the reference's sentence-gloss cache key
   *  (common/CoreMapUtils.java:510-524): md5(whitespace-normalized
   *  sentence) + ":" + first 7 hex of md5(entity) + ":" + first 7 hex of
   *  md5(value). In-pipeline bag identity stays the provenance span (the
   *  snapshot tables are the datum cache); this key is the CROSS-RUN
   *  stable identity for an external datum/sentence cache, byte-compatible
   *  with the reference's so cached datums could be shared. */
  private val WsRun = java.util.regex.Pattern.compile("\\s+")
  def glossKey(sentenceGloss: String, entityGloss: String,
               valueGloss: String): String =
    md5hex(WsRun.matcher(sentenceGloss).replaceAll(" ").trim) + ":" +
      md5hex(entityGloss.trim).substring(0, 7) + ":" +
      md5hex(valueGloss.trim).substring(0, 7)

  def fromSentence(s: Sentence): Seq[Candidate] = {
    if (s.tokens.length > MaxSentenceTokens) return Nil
    val Mentions.Spans(ents, slots) = Mentions.extract(s)
    if (ents.isEmpty) return Nil
    val toks = s.tokens.toIndexedSeq
    val words = toks.map(_.word)
    val ners = toks.map(_.ner)
    // lowercase once per sentence: between-windows of different candidate
    // pairs overlap heavily, and per-pair toLowerCase was measurable
    val wordsLc = words.map(_.toLowerCase).toArray
    // one deterministic arc pass per sentence; every pair's dependency
    // features walk the same forest
    val arcs = graft.nlp.DepLite.forest(toks)

    val out = Seq.newBuilder[Candidate]
    val seen = scala.collection.mutable.HashSet[(String, String)]()

    for (ent <- ents) {
      val slotCands = slots.iterator ++
        ents.iterator.filter(o => o.b != ent.b || o.e != ent.e)
      for (slot <- slotCands) {
        val overlap = ent.b < slot.e && slot.b < ent.e
        val dist =
          if (overlap) 0
          else if (ent.e <= slot.b) slot.b - ent.e else ent.b - slot.e
        if (!overlap && dist <= Mentions.MaxEntitySlotDistance &&
            ent.normalized != slot.normalized) {
          val key = (ent.normalized, slot.normalized)
          if (seen.add(key)) {
            val entFirst = ent.e <= slot.b
            val (lo, hi) = if (entFirst) (ent.e, slot.b) else (slot.e, ent.b)
            // r6 (guide §1.2 step 2, per-task work): the raw-case copy of
            // the between-window existed only to be re-lowercased inside
            // featurize — every consumer reads the lowercase form, so only
            // that is materialized now
            val betweenLc = java.util.Arrays.copyOfRange(wordsLc, lo, hi)
            // pattern hits computed here where the raw ordered between-window
            // is available; carried as rule=<rel> / trigger=<rel> features so
            // scoring stays a pure function of the feature vector.
            val (ruleHits, triggerHits) = Patterns.matchBoth(ent.ner,
              slot.ner, entFirst, betweenLc)
            out += Candidate(
              subj = ent.normalized,
              subj_type = ent.ner,
              obj = slot.normalized,
              obj_surface = slot.surface,
              obj_type = slot.ner,
              url = s.url, doc_id = s.doc_id, sent_idx = s.sent_idx,
              ent_b = ent.b, ent_e = ent.e, slot_b = slot.b, slot_e = slot.e,
              features = featurize(ent.ner, slot.ner, entFirst, dist,
                betweenLc, wordsLc, ners, ent.b, ent.e, slot.b, slot.e,
                corefSlot = slot.normalized != slot.surface) ++
                graft.nlp.DepLite.pathFeatures(toks, arcs,
                  ent.b, ent.e, slot.b, slot.e) ++
                triggerHits.map(rel => Patterns.triggerFeature(rel)) ++
                ruleHits.map(rel => Patterns.ruleFeature(rel)),
              between = betweenLc.toSeq)
          }
        }
      }
    }
    out.result()
  }

  private def distBin(d: Int): String =
    if (d == 0) "0" else if (d == 1) "1" else if (d == 2) "2"
    else if (d <= 5) "3-5" else if (d <= 10) "6-10" else "11-25"

  private def sp(s: String) = s.replace(' ', '_') // FeatureFactory.java:129-141

  /** Per-JVM memo of word-keyed feature strings: the vocabulary repeats
   *  massively across candidates, and the NLP stage is allocation-bound
   *  on this VM — building "family=word" once per (family, word) instead
   *  of once per candidate is a measured win. The emitted strings are
   *  byte-identical to the unmemoized form (the frozen LR's feature
   *  space). Bounded: beyond 2^20 distinct words a family falls back to
   *  direct construction. */
  private final class FeatureMemo(make: String => String) {
    private val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    @volatile private var full = false
    // bound check ONLY on miss: ConcurrentHashMap.size() sums striped
    // counter cells whose count grows with writer threads — per-lookup
    // size() anti-scales with executor parallelism (measured at local[32])
    def apply(w: String): String = {
      val hit = m.get(w)
      if (hit != null) hit
      else {
        val v = make(w)
        if (!full) {
          m.put(w, v)
          if (m.size > (1 << 20)) full = true
        }
        v
      }
    }
  }
  private val betweenUniF = new FeatureMemo(w => "between_uni=" + sp(w))
  private val betweenClF =
    new FeatureMemo(w => "between_cluster=" + Gazetteers.wordCluster(w))
  // small fixed domains (NER types, type pairs, distance bins) — the
  // interpolated strings repeat across every candidate of a type pair
  private val arg1TypeF = new FeatureMemo(t => "arg1type=" + t)
  private val arg2TypeF = new FeatureMemo(t => "arg2type=" + t)
  private val argTypesF = new FeatureMemo(t => "argtypes=" + t)
  private val entityBetweenF = new FeatureMemo(t => "entity_between=" + t)
  private val entPrevF = new FeatureMemo(w => "ent_prev=" + sp(w))
  private val entNextF = new FeatureMemo(w => "ent_next=" + sp(w))
  private val slotPrevF = new FeatureMemo(w => "slot_prev=" + sp(w))
  private val slotNextF = new FeatureMemo(w => "slot_next=" + sp(w))
  private val entPrevClF =
    new FeatureMemo(w => "ent_prev_cluster=" + Gazetteers.wordCluster(w))
  private val entNextClF =
    new FeatureMemo(w => "ent_next_cluster=" + Gazetteers.wordCluster(w))
  private val slotPrevClF =
    new FeatureMemo(w => "slot_prev_cluster=" + Gazetteers.wordCluster(w))
  private val slotNextClF =
    new FeatureMemo(w => "slot_next_cluster=" + Gazetteers.wordCluster(w))
  private val arg2WordF = new FeatureMemo(w => "arg2word=" + sp(w))
  private val arg2ClF =
    new FeatureMemo(w => "arg2cluster=" + Gazetteers.wordCluster(w))
  private val arg2SpanF = new FeatureMemo(w => "arg2span_uni=" + sp(w))

  /** Surface feature families -> ARRAY<STRING> sparse vector
   *  (FeatureFactory.java families, production set minus the
   *  parse/dependency ones — SURVEY.md §2.4 F1):
   *  arg types/order (:175-191), surface distance binary + bins
   *  (:259-280), between-span unigrams/bigrams/clusters (:451-522),
   *  adjacent words + clusters (:371-399), arg2 span words (arg1 not
   *  lexicalized, KBPProcess.java:64), entities-between + counts
   *  (:401-449), number/date bins (:524-564), coref flag (:597-602). */
  def featurize(subjType: String, objType: String, entFirst: Boolean,
                dist: Int, betweenLc: Array[String], wordsLc: Array[String],
                ners: IndexedSeq[String],
                eb: Int, ee: Int, sb: Int, se: Int,
                corefSlot: Boolean): Seq[String] = {
    // r6 (guide §1.2 step 2): this is the dominant per-candidate cost of
    // the map stage (FeatMicro). Three changes, all byte-identical output:
    // the caller's per-sentence lowercase arrays are indexed directly
    // (the old signature re-ran toLowerCase on every word of every
    // candidate's windows), the small fixed-domain families are memoized
    // like the word families, and the trailing `.distinct` pass is fused
    // into the builder (first-occurrence order preserved via a seen-set,
    // exactly what Seq.distinct keeps).
    val f = Vector.newBuilder[String]
    val dedup = new java.util.HashSet[String](64)
    def add(s: String): Unit = if (dedup.add(s)) f += s
    add(arg1TypeF(subjType))
    add(arg2TypeF(objType))
    add(argTypesF(subjType + "-" + objType))
    add(if (entFirst) "arg_order=e_before_s" else "arg_order=s_before_e")
    add(distBinF(dist))
    // surface_distance_binary (:259-266): close pairs are special
    if (dist <= 4) add("dist_binary=short")
    var bi = 0
    while (bi < betweenLc.length) { add(betweenUniF(betweenLc(bi))); bi += 1 }
    bi = 0
    while (bi + 1 < betweenLc.length) {
      // tokens never contain spaces (Tokenizer emits \S runs), so the old
      // sp(mkString("_")) is a plain '_'-join
      add(new java.lang.StringBuilder(24).append("between_bi=")
        .append(betweenLc(bi)).append('_').append(betweenLc(bi + 1)).toString)
      bi += 1
    }
    bi = 0
    while (bi < betweenLc.length) { add(betweenClF(betweenLc(bi))); bi += 1 }
    // adjacent words + clusters (windows of 1 around each span)
    if (eb > 0) {
      val w = wordsLc(eb - 1)
      add(entPrevF(w)); add(entPrevClF(w))
    }
    if (ee < wordsLc.length) {
      val w = wordsLc(ee)
      add(entNextF(w)); add(entNextClF(w))
    }
    if (sb > 0) {
      val w = wordsLc(sb - 1)
      add(slotPrevF(w)); add(slotPrevClF(w))
    }
    if (se < wordsLc.length) {
      val w = wordsLc(se)
      add(slotNextF(w)); add(slotNextClF(w))
    }
    // arg2 span words (arg1 not lexicalized): head + every span unigram
    val head = wordsLc(se - 1)
    add(arg2WordF(head))
    add(arg2ClF(head))
    var k = sb
    while (k < se) {
      add(arg2SpanF(wordsLc(k)))
      k += 1
    }
    // entities-between + counts (:401-449): NE runs strictly between spans
    val (lo, hi) = if (entFirst) (ee, sb) else (se, eb)
    var nEnts = 0
    var i = lo
    while (i < hi) {
      val t = ners(i)
      if (t != "O" && (i == lo || ners(i - 1) != t)) {
        add(entityBetweenF(t))
        nEnts += 1
      }
      i += 1
    }
    add(if (nEnts == 0) "entities_between_bin=0"
        else if (nEnts == 1) "entities_between_bin=1"
        else if (nEnts == 2) "entities_between_bin=2"
        else "entities_between_bin=3+")
    if (nEnts == 0) add("no_entity_between")
    // number/date bins (:524-564) — digits are case-invariant, so the
    // lowercase forms feed them unchanged
    if (objType == graft.model.NER.NUMBER) {
      val digits = head.takeWhile(_.isDigit)
      if (digits.nonEmpty) add(s"number_magnitude=${digits.length}")
    }
    if (objType == graft.model.NER.DATE) {
      val y = wordsLc(sb).takeWhile(_.isDigit)
      if (y.length == 4) add(s"date_decade=${y.take(3)}")
    }
    // coref flag (:597-602): the slot surfaced via an antecedent rewrite
    if (corefSlot) add("arg2_coref")
    // trigger features are appended by the caller from the direction-aware
    // pattern matcher (Patterns.matchBoth), not from a bag-of-words list
    f.result()
  }

  private val distBinFeats = Map(
    "0" -> "dist_bin=0", "1" -> "dist_bin=1", "2" -> "dist_bin=2",
    "3-5" -> "dist_bin=3-5", "6-10" -> "dist_bin=6-10",
    "11-25" -> "dist_bin=11-25")
  private def distBinF(d: Int): String = distBinFeats(distBin(d))
}
