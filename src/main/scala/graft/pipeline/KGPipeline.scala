package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._
import graft.nlp.Annotator
import graft.extract.{Candidates, Scorer}
import graft.consistency.Consistency
import graft.link.Linker
import graft.io.TableIO

/**
 * The end-to-end KG-construction dataflow (north_rule):
 *
 *   pages --mapPartitions NLP--> sentences --flatMap--> scored fills
 *     --[shuffle 1: bag agg by (pair, pred)]--> merged fills
 *     --unary consistency (row-local)--> valid fills
 *     --[linking: blocked alias pairs + driver union-find, broadcast-joined
 *        rewrite]--> canonical fills --symmetric expansion-->
 *     --[shuffle 2: per-CANONICAL-entity consistency X13-X18]-->
 *     --[shuffle 3: edge merge + official rename]--> triples
 *
 * Stage order mirrors the reference's inferential path
 * (InferentialSlotFiller.java:52-176: unary -> EntityMerging -> symmetric
 * -> global consistency pass 2), so SINGLE-cardinality argmax and
 * approximate dedup see the fills of one CANONICAL entity, not one surface
 * form. Plan shape per SURVEY.md §3.1: everything through scoring is
 * per-document local (one mapPartitions, no shuffle); exactly three data
 * shuffles, each on an explicit key (pair / canonical subj / triple key) —
 * the fixed-overhead tail that caps N->4N scaling is kept minimal. The
 * triples table is written partitioned by pred (partition pruning for
 * per-relation consumers).
 */
object KGPipeline {

  /** Bumped whenever a snapshot table's MEANING changes (not just its
   *  schema): v2 = fills_linked is linked+symmetric, PRE-consistency.
   *  TableIO.ensureVersion refuses to resume a mismatched run dir. */
  val PipelineVersion = "v2"

  /** Stage 0 (optional): crawl-level duplicate removal BEFORE any NLP —
   *  at web scale the single biggest compute saving available (a crawl
   *  is routinely 30-50% duplicate; every page dropped here skips
   *  tokenize/NER/coref/scoring entirely).
   *
   *  Default mode (near=false) is EXACT content dedup: keep the min-url
   *  page per md5(text) — recrawls and mirrors. One hash shuffle, zero
   *  recall risk, and the triple set is PROVABLY unchanged including
   *  scores: a dropped page is byte-identical to its keeper, so its
   *  mention bag contributions are exact duplicates the bag noisy-or
   *  already merges — only prov_url can differ. This is the mode
   *  `run(dedup=true)` wires in.
   *
   *  near=true is curation-grade MinHash clustering (star edges →
   *  connected components → longest-copy election, NearDup.dedupVerdicts
   *  over 3-gram shingles): it also drops NEAR-duplicates — templated
   *  pages carrying different entities — trading extraction recall for
   *  corpus size, which is the right trade for training-data prep and
   *  the wrong default for KG recall. Pages are keyed by xxhash64(url)
   *  for the election's total order; a 64-bit collision merely makes two
   *  pages share a verdict row, so a collision can never DROP a
   *  non-duplicate page, only fail to drop a duplicate. */
  def dedupPages(spark: SparkSession, pages: Dataset[Page],
                 near: Boolean = false): Dataset[Page] = {
    import spark.implicits._
    if (!near) {
      val keep = pages.groupBy(md5($"text").as("_h"))
        .agg(min($"url").as("url")).select($"url")
      pages.join(keep, Seq("url"), "left_semi").as[Page]
    } else {
      val ids = pages.select(xxhash64($"url").as("doc_id"), $"text")
      val keep = graft.dedup.NearDup.dedupVerdicts(spark, ids, shingle = 3)
        .filter($"keep").select($"doc_id")
      pages.join(keep, xxhash64(pages("url")) === keep("doc_id"), "left_semi")
        .as[Page]
    }
  }

  /** Stage 1: NLP annotate (tokenize/ssplit/pos/ner/coref), early gates
   *  inside the partition (lang + length — Catalyst can't invent these). */
  def sentences(spark: SparkSession, pages: Dataset[Page]): Dataset[Sentence] = {
    import spark.implicits._
    pages.filter(p => Annotator.admits(p.lang, p.text))
      .mapPartitions(_.flatMap(Annotator.annotate))
  }

  /** Stages 2-4 (+5b): mentions -> candidate pairs -> per-mention scores
   *  -> unary consistency (X1-X12 row-local checks/rewrites), fused in one
   *  narrow pass — no shuffle, and no separate typed stage re-serializing
   *  the fills stream just to run a row-local filter. Applying the unary
   *  rewrites (date padding, nationality->country) BEFORE bag aggregation
   *  also unifies keys earlier, shrinking the shuffle. */
  def mentionFills(spark: SparkSession, sents: Dataset[Sentence]): Dataset[SlotFill] = {
    import spark.implicits._
    sents.mapPartitions(_.flatMap(s =>
      Candidates.fromSentence(s).flatMap(Scorer.toFills)
        .flatMap(Consistency.unaryOne)))
  }

  /** MIML-RE twin of [[mentionFills]] (C2 as a first-class pipeline
   *  classifier, not just a spec exhibit): candidates flow into
   *  `MimlEm.classifyBags` — per-sentence z inference + bag-level y
   *  probability with the FROZEN fold-EM model — and its bag-level fills
   *  then take the same row-local unary pass. Scores are already
   *  bag-merged and y-thresholded inside classifyBags, so the pipeline
   *  must NOT re-apply the LR path's `yThenNoisyOrGate` (LR thresholds
   *  belong to the LR model); `run(classifier = "miml")` wires that.
   *  One groupByKey shuffle on the bag key — same count as the LR
   *  path's bag aggregation. */
  def mentionFillsMiml(spark: SparkSession,
                       sents: Dataset[Sentence]): Dataset[SlotFill] = {
    import spark.implicits._
    val model = graft.classify.MimlEm.frozen.getOrElse(throw new IllegalStateException(
      "no frozen MIML model on the classpath (graft/miml_z_weights.tsv)"))
    val cands = sents.mapPartitions(_.flatMap(Candidates.fromSentence))
    graft.classify.MimlEm.classifyBags(spark, cands, model)
      .flatMap(Consistency.unaryOne)
  }

  /** Stage 5: bag aggregation — merge per-mention scores for the same
   *  (KBPair, relation) via noisy-or (common/Utils.java:287-291,
   *  JointBayesRelationExtractor.java:2037-2051), keeping the
   *  highest-scoring mention's provenance (P1 as a column —
   *  SimpleSlotFiller.findBestProvenance without a second pass). */
  def aggregateBags(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    // r6 (guide §2.4/§1.2): the former groupBy().agg(sum(log1p...),
    // max(struct(score, prov))) planned as SortAggregate — a struct-typed
    // aggregation buffer is not UnsafeRow-mutable, so Spark sorted the
    // WHOLE fills stream by the 5-column string key TWICE (partial +
    // final; AggProbe pins the planner behavior). This form keeps the one
    // hash exchange on the bag key and replaces both sorts with a
    // streaming per-partition merge whose per-bag state is O(1): the
    // running log-domain sum and the current argmax (score, prov). Same
    // contract as before: log1p terms still sum in arrival order with the
    // result rounded to 12 decimals (the determinism barrier), and the
    // argmax ordering is (score, prov) exactly as the struct-max computed
    // it (provOrdering — same field order; byte order vs the SQL struct
    // compare coincides on the ASCII doc ids/urls this pipeline emits,
    // the same assumption groupTriples already makes). Trade, documented:
    // no map-side partial aggregation — the shuffle carries every fill
    // (measured bag duplication ~1.17x at bench scale); in exchange the
    // two full-stream sorts disappear, which measured far larger.
    fills.toDF()
      .repartition($"subj", $"subj_type", $"pred", $"obj", $"obj_type")
      .as[SlotFill]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap[
          (String, String, String, String, String),
          BagAcc]()
        it.foreach { f =>
          val k = (f.subj, f.subj_type, f.pred, f.obj, f.obj_type)
          val a = acc.getOrElseUpdate(k, new BagAcc)
          // SQL-exact: Spark's log1p(-1.0) is NULL (out of domain) and
          // sum() skips nulls, so a p=1 fill contributes NOTHING to the
          // log sum — the golden-hash corpus pins this (a bag of {1.0,
          // 0.8} scores 0.8, not 1.0)
          if (f.score < 1.0) {
            a.sumLog += math.log1p(-f.score)
            a.nTerms += 1
          }
          val sp = (f.score, f.prov)
          if (a.best == null || provOrdering.gt(sp, a.best)) a.best = sp
        }
        acc.iterator.map { case ((subj, st, pred, obj, ot), a) =>
          // exact mirror of the SQL least(round(1 - exp(sum), 12), 1.0):
          // an all-null sum is NULL and least(NULL, 1.0) = 1.0
          val s =
            if (a.nTerms == 0) 1.0
            else math.min(1.0,
              BigDecimal(1.0 - math.exp(a.sumLog))
                .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
          SlotFill(subj, st, pred, obj, ot, s, a.best._2)
        }
      }
  }

  private final class BagAcc {
    var sumLog: Double = 0.0
    var nTerms: Int = 0
    var best: (Double, Provenance) = null
  }

  /** Stage 5y: the reference's DEFAULT output mode `y_then_noisy_or`
   *  (Props.java:332-337; JointBayesRelationExtractor.java:1989-2110):
   *  after the per-bag noisy-or merge, a bag survives only if its merged
   *  score crosses the relation's y threshold — the FROZEN per-relation
   *  threshold when the trained model is shipped (capped at 1.0 so a
   *  rules-only relation, frozen threshold 2.0, still passes its 1.0 rule
   *  hits), 0.5 otherwise (the jointbayes default). Row-local filter — no
   *  exchange. */
  def yThenNoisyOrGate(spark: SparkSession, bags: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    val thrMap: Map[String, Double] = graft.extract.Scorer.frozen
      .map { case (r, m) => r -> math.min(m.threshold, 1.0) }
    val thrCol =
      if (thrMap.isEmpty) lit(0.5)
      else coalesce(element_at(typedLit(thrMap), $"pred"), lit(0.5))
    bags.toDF().filter($"score" >= thrCol).as[SlotFill]
  }

  /** Stage 5b standalone (the pipeline fuses this into mentionFills):
   *  unary consistency (X1-X12 per-fill checks), row-local. */
  def unary(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    fills.flatMap(Consistency.unaryOne)
  }

  /** Stage 6: entity linking + canonicalization (G2). */
  def linked(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] =
    Linker.canonicalize(spark, fills)

  /** Deterministic keep-best order for exact (pred, obj) duplicates —
   *  the same argmax X13 would take (score first), with types + provenance
   *  as total tiebreaks so the survivor never depends on shuffle-arrival
   *  order. */
  private val dupOrdering: Ordering[SlotFill] =
    Ordering.by { f: SlotFill =>
      ((f.score, f.subj_type, f.obj_type),
        (f.prov.doc_id, f.prov.url, f.prov.sent_idx, f.prov.ent_b,
          f.prov.ent_e, f.prov.slot_b, f.prov.slot_e))
    }

  /** Streaming exact-duplicate PRE-MERGE for one subject's row iterator:
   *  rows sharing (pred, obj) collapse to the dupOrdering-max row AS THEY
   *  ARRIVE (hash-keyed, no buffering of the raw group and no secondary
   *  sort), so the per-subject heap holds only DISTINCT (pred, obj) fills.
   *  This bounds a hot canonical subject carrying 10^6 exact-duplicate
   *  fills (post-linking alias pile-up) to its distinct-fill count — the
   *  collapse is exactly the X13 argmax, so downstream semantics are
   *  unchanged (and entityPass re-sorts, so the map's arrival order never
   *  leaks into the output). An earlier sortWithinPartitions(subj, pred,
   *  obj) variant achieved the same bound but the extra 3-string-column
   *  sort measurably cost the high-parallelism side of the scaling bench. */
  private def distinctFills(it: Iterator[SlotFill]): Seq[SlotFill] = {
    val acc = scala.collection.mutable.HashMap[(String, String), SlotFill]()
    it.foreach { f =>
      val k = (f.pred, f.obj)
      acc.get(k) match {
        case Some(cur) => if (dupOrdering.gt(f, cur)) acc(k) = f
        case None => acc(k) = f
      }
    }
    acc.values.toVector
  }

  /** Stage 7: per-entity global consistency (X13-X18), grouped by CANONICAL
   *  subject (post-linking — InferentialSlotFiller.java:122-165 order). */
  def consistent(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    fills.groupByKey(_.subj)
      .flatMapGroups((_, it) => Consistency.entityPass(distinctFills(it)))
  }

  /** Fused stages 7+8: ONE shuffle on the canonical subject carries both
   *  the X13-X18 pass and the graph materialize — every row of a
   *  (subj, pred, obj) triple key lives inside its subject's group, so the
   *  official rename, the noisy-or edge merge and the Triple projection
   *  run group-locally; the separate triple-merge exchange disappears. */
  def consistentTriples(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[Triple] = {
    import spark.implicits._
    // One shuffle on the canonical subject, expressed as column-level
    // repartition + 1-column sort + a run-grouping mapPartitions instead
    // of typed groupByKey: groupByKey(_.subj) deserializes every SlotFill
    // BEFORE the exchange just to append a key that already exists as a
    // column, then sorts on the appended key anyway (flatMapGroups is
    // sort-based). The column form keeps rows unsafe end-to-end and
    // deserializes once, after the sort — measured 2x on this stage at
    // 1.2M pages (JobBProbe), where the stage was allocation-bound, not
    // skew-bound (max group 39 rows).
    fills.toDF().repartition($"subj").sortWithinPartitions($"subj")
      .as[SlotFill].mapPartitions { it =>
        val buf = it.buffered
        new Iterator[Iterator[Triple]] {
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[Triple] = {
            val groupSubj = buf.head.subj
            val run = scala.collection.mutable.ArrayBuffer[SlotFill]()
            while (buf.hasNext && buf.head.subj == groupSubj) run += buf.next()
            groupTriples(groupSubj, run)
          }
        }.flatten
      }
  }

  /** One canonical subject's fills -> consistent merged triples (the
   *  X13-X18 pass + official rename + noisy-or edge merge + Triple
   *  projection, group-local). */
  private def groupTriples(groupSubj: String,
                           run: scala.collection.Seq[SlotFill]): Iterator[Triple] = {
    val group = distinctFills(run.iterator)
    val kept = Consistency.entityPass(group)
    // official rename + per-key noisy-or merge (deterministic: scores
    // sorted before the log-domain sum, result rounded like
    // aggregateBags; provenance = lexicographic argmax)
    val acc = scala.collection.mutable.LinkedHashMap[
      (String, String, String, String),
      (List[Double], (Double, Provenance))]()
    kept.foreach { f =>
      val pred = Relations.officialName(f.pred)
      val k = (f.subj_type, pred, f.obj, f.obj_type)
      val sp = (f.score, f.prov)
      acc.get(k) match {
        case Some((scores, best)) =>
          acc(k) = (f.score :: scores,
            if (provOrdering.gt(sp, best)) sp else best)
        case None => acc(k) = (List(f.score), sp)
      }
    }
    acc.iterator.map { case ((st, pred, obj, ot), (scores, (_, prov))) =>
      val merged = noisyOr(scores)
      Triple(groupSubj, entityId(groupSubj, st), st, pred, obj,
        entityId(obj, ot), ot, merged, prov.doc_id, prov.url, prov.sent_idx)
    }
  }

  /** Scala twin of the SQL merge: 1 - prod(1-s) in the log domain, terms
   *  sorted (order-independent), rounded to 12 decimals, capped at 1. */
  private def noisyOr(scores: List[Double]): Double = {
    // singleton fast path (the overwhelmingly common case once bags are
    // pre-merged): a 1-element map/sort/sum is the element itself
    val s =
      if (scores.tail.isEmpty) math.log1p(-math.min(scores.head, 1.0))
      else scores.map(x => math.log1p(-math.min(x, 1.0))).sorted.sum
    math.min(1.0,
      BigDecimal(1.0 - math.exp(s)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  private val provOrdering: Ordering[(Double, Provenance)] =
    Ordering.by { case (s, p) =>
      (s, p.doc_id, p.url, p.sent_idx, p.ent_b, p.ent_e, p.slot_b, p.slot_e)
    }

  /** Scala twin of Linker.idCol (same md5-hex format). Runs twice per
   *  output triple inside the fused consistency shuffle, so the digest is
   *  thread-local (MessageDigest.getInstance per row showed up in executor
   *  stack samples) and hex goes through a table, not a format call. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  def entityId(name: String, tpe: String): String = {
    val md = md5Local.get()
    md.reset()
    val h = md.digest((tpe + "|" + name).getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((h(i) >> 4) & 0xF)
      out(2 * i + 1) = hexChars(h(i) & 0xF)
      i += 1
    }
    "e:" + tpe.substring(0, math.min(3, tpe.length)).toLowerCase + ":" +
      new String(out)
  }

  /** Symmetric relations (G4, SymmetricFunctionRewritePostProcessor):
   *  reverse edges for spouse/siblings/other_family/alternate_names. */
  private val symmetricPreds = Set("per:spouse", "per:siblings",
    "per:other_family", "per:alternate_names", "org:alternate_names")

  def symmetricExpand(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    // column ops, not typed map: stays in whole-stage codegen (no object
    // serde round-trip on the full fills stream)
    val df = fills.toDF()
    val rev = df.filter($"pred".isin(symmetricPreds.toSeq: _*) &&
        $"subj_type" === $"obj_type" &&
        $"obj_type".isin(NER.PERSON, NER.ORGANIZATION))
      .select($"obj".as("subj"), $"subj_type", $"pred",
        $"subj".as("obj"), $"obj_type", $"score", $"prov")
    df.unionByName(rev).as[SlotFill]
  }

  /** Stage 8: graph materialize — edge merge by noisy-or
   *  (EntityGraph.mergeEdges, evaluate/EntityGraph.java:85-100), official
   *  2013 relation rename (K1 — the canonicalization named in north_rule),
   *  then Triple rows. */
  def triples(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[Triple] = {
    import spark.implicits._
    // official rename as a broadcast map-literal lookup (codegen'd), not a
    // typed map over objects
    val renameMap = typedLit(Relations.official2013)
    val renamed = fills.toDF()
      .withColumn("pred",
        coalesce(element_at(renameMap, $"pred"), $"pred"))
    renamed
      .groupBy($"subj", $"subj_type", $"pred", $"obj", $"obj_type")
      .agg(
        round(lit(1.0) - exp(sum(log1p(-least($"score", lit(1.0))))), 12).as("score"),
        max(struct($"score", $"prov")).getField("prov").as("prov"))
      .select(
        $"subj",
        Linker.idCol($"subj", $"subj_type").as("subj_id"),
        $"subj_type", $"pred", $"obj",
        Linker.idCol($"obj", $"obj_type").as("obj_id"),
        $"obj_type",
        least($"score", lit(1.0)).as("score"),
        $"prov.doc_id".as("prov_doc_id"),
        $"prov.url".as("prov_url"),
        $"prov.sent_idx".as("prov_sent_idx"))
      .as[Triple]
  }

  /** Telemetry: urls re-annotated (status new/changed) by the last
   *  [[incrementalRun]]; -1 before any run. */
  @volatile var lastIncrementalRedo: Long = -1L

  /** Incremental recrawl update — [[graft.text.Curation.crawlDelta]] as a
   *  pipeline stage 0': re-run NLP + scoring ONLY over pages whose text is
   *  new or changed vs the previous crawl, reuse the previous run's raw
   *  fills (its `fills_raw` snapshot) for unchanged urls, and drop the
   *  fills of deleted/changed urls. The downstream stages (bag agg →
   *  y gate → linking → symmetric expansion → consistency → triples)
   *  always rerun globally over the fill union: they are the cheap tail
   *  (per-page NLP dominates measured pipeline cost), and a global rerun
   *  keeps every cross-page semantic (bag membership, alias linking, the
   *  X13-X18 entity passes) EXACTLY equal to a full recompute —
   *  PipelineE2ESpec pins triple-set equality including scores.
   *
   *  Scale shape: the delta carries only (url, status) rows; both
   *  downstream uses are url-keyed semi-joins; at change fraction f the
   *  NLP stage — the dominant cost — processes f of the crawl. The delta
   *  is persisted and eagerly materialized by the telemetry count, so the
   *  md5 scan of BOTH corpora runs exactly once per increment — a `def`
   *  here (the round-3 shape) re-ran the full-outer md5 join for each of
   *  its three consumers, i.e. three full input scans where one suffices;
   *  IncrProbe measured that overhead flipping the incremental path
   *  SLOWER than a full recompute at 20k pages/5%. Cache lifecycle
   *  follows the Linker contract: the cached block is tiny
   *  (url+status, ~100 B/url, LRU-evictable), each incrementalFills
   *  call releases the previous call's delta, and callers that want a
   *  clean session call [[releaseIncrementalDelta]] after materializing
   *  the returned Dataset. At 10^12-url scale the right form is an
   *  ingest-time md5 column on the crawl table (computed while the bytes
   *  are already in memory) so the delta join never rereads text at all —
   *  this method computes it on the fly because the Page schema is the
   *  BASELINE-pinned input shape. */
  def incrementalRun(spark: SparkSession,
                     prevPages: Dataset[Page],
                     prevFillsRaw: Dataset[SlotFill],
                     newPages: Dataset[Page]): Dataset[Triple] = {
    val raw = incrementalFills(spark, prevPages, prevFillsRaw, newPages)
    val bags = yThenNoisyOrGate(spark, aggregateBags(spark, raw))
    consistentTriples(spark, symmetricExpand(spark, linked(spark, bags)))
  }

  /** Signature-table variant of [[incrementalRun]] — the form a production
   *  recrawl loop runs: `prevSig` is the (url, md5) table
   *  [[pageSignatures]] emitted for the PREVIOUS crawl (persisted beside
   *  its `fills_raw` snapshot), so detecting the delta costs ONE md5 scan
   *  of the new crawl's text plus a join against a hash-width table —
   *  the previous crawl's text is never read again. The Page-based
   *  overload recomputes `prevSig` from `prevPages` and exists for
   *  one-shot comparisons; IncrProbe measured it paying ~2× the delta
   *  cost for exactly that reason. */
  def incrementalRunSig(spark: SparkSession,
                        prevSig: DataFrame,
                        prevFillsRaw: Dataset[SlotFill],
                        newPages: Dataset[Page]): Dataset[Triple] = {
    val raw = incrementalFillsSig(spark, prevSig, prevFillsRaw, newPages)
    val bags = yThenNoisyOrGate(spark, aggregateBags(spark, raw))
    consistentTriples(spark, symmetricExpand(spark, linked(spark, bags)))
  }

  /** (url, md5-of-text) signature table for a crawl snapshot — the
   *  carry-forward state of the incremental loop (write it beside the
   *  `fills_raw` snapshot; ~50 B/url, column-pruned scan of url+text
   *  only). At ingest time the md5 is better computed while the page
   *  bytes are in memory and stored as a column on the crawl table; this
   *  derives it after the fact because the Page schema is the
   *  BASELINE-pinned input shape. */
  def pageSignatures(pages: Dataset[Page]): DataFrame =
    pages.toDF().select(col("url"), md5(col("text")).as("md5"))

  /** The raw-fill half of [[incrementalRun]], exposed for CHAINING
   *  increments: its output is exactly the `fills_raw` content a full run
   *  over `newPages` would produce, so snapshotting it (TableIO) makes it
   *  the `prevFillsRaw` of the NEXT crawl's increment — each recrawl pays
   *  NLP only for its own delta, forever. */
  def incrementalFills(spark: SparkSession,
                       prevPages: Dataset[Page],
                       prevFillsRaw: Dataset[SlotFill],
                       newPages: Dataset[Page]): Dataset[SlotFill] =
    incrementalFillsSig(spark, pageSignatures(prevPages), prevFillsRaw,
      newPages)

  /** Per-invocation result of [[incrementalFillsDelta]]: the fills
   *  Dataset plus THIS call's cached (url, status) delta and redo count.
   *  Owning the cache here (instead of a process-global slot) lets two
   *  incremental runs interleave in one session — e.g. two recrawlLoop
   *  streams — without unpersisting each other's delta mid-plan or
   *  racing the redo telemetry. Call [[release]] once `fills` (and any
   *  plan derived from it) has been materialized. */
  final case class IncrementalFills(fills: Dataset[SlotFill],
                                    delta: DataFrame,
                                    redoCount: Long) {
    def release(): Unit =
      if (!delta.sparkSession.sparkContext.isStopped) delta.unpersist()
  }

  /** Signature-table variant of the fills half (see [[incrementalRun]]
   *  overload). Deleted urls simply never appear on the new side, so
   *  their previous fills drop out of the unchanged semi-join — no
   *  explicit delete pass needed. Single-flight convenience wrapper over
   *  [[incrementalFillsDelta]]: the delta cache and redo count land in
   *  session-global slots ([[releaseIncrementalDelta]],
   *  [[lastIncrementalRedo]]), so ONE incremental run at a time —
   *  concurrent callers must use [[incrementalFillsDelta]] directly. */
  def incrementalFillsSig(spark: SparkSession,
                          prevSig: DataFrame,
                          prevFillsRaw: Dataset[SlotFill],
                          newPages: Dataset[Page]): Dataset[SlotFill] = {
    releaseIncrementalDelta()
    val h = incrementalFillsDelta(spark, prevSig, prevFillsRaw, newPages)
    lastIncrementalDelta = h.delta
    lastIncrementalRedo = h.redoCount
    h.fills
  }

  /** Core of the incremental-fills path, global-state-free: returns the
   *  fills together with the invocation's own delta cache handle. */
  def incrementalFillsDelta(spark: SparkSession,
                            prevSig: DataFrame,
                            prevFillsRaw: Dataset[SlotFill],
                            newPages: Dataset[Page]): IncrementalFills = {
    import spark.implicits._
    val delta = pageSignatures(newPages)
      .join(prevSig.withColumnRenamed("md5", "_old_md5"),
        Seq("url"), "left_outer")
      .select($"url",
        when($"_old_md5".isNull, lit("new"))
          .when($"_old_md5" === $"md5", lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
      .persist()
    // one status-rollup job materializes the delta cache AND yields every
    // count the method needs; |dropped| = |prev| − unchanged (deleted =
    // prev urls absent from the new side, changed swap reuse for redo),
    // so no count ever runs a join — IncrProbe caught an earlier
    // dropped.count() paying a 200k×210k sort-merge anti-join just to
    // pick a join strategy
    val statusCounts = delta.groupBy($"status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val redoCount = statusCounts.getOrElse("new", 0L) +
      statusCounts.getOrElse("changed", 0L)
    val redo = newPages.join(
      delta.filter($"status".isin("new", "changed")).select($"url"),
      Seq("url"), "left_semi").as[Page]
    // reuse = previous fills MINUS the dropped urls, as an ANTI-join
    // against the DROPPED set (deleted ∪ changed, ~f of the corpus —
    // broadcastable at any sane change rate), never a semi-join against
    // the unchanged set (~1-f of the corpus — IncrProbe measured that
    // build side tipping past the broadcast threshold into a sort-merge
    // join of the full fills table). Deleted urls come from the cached
    // delta (prev urls absent from the new side), no extra text scan.
    val deleted = prevSig.select($"url").join(delta.select($"url"),
      Seq("url"), "left_anti")
    val dropped = deleted.unionByName(
      delta.filter($"status" === "changed").select($"url"))
      .select($"url".as("_drop_url"))
    // size-adaptive like Linker.canonicalize: broadcast the dropped set
    // when it fits an executor, shuffle anti-join above that (at 10^12
    // docs a 5% delta is ~5·10^10 urls — no broadcasting that). The size
    // comes from arithmetic over the status rollup + a metadata-only
    // parquet count — never a join
    val nDropped =
      prevSig.count() - statusCounts.getOrElse("unchanged", 0L)
    val dropSide =
      if (nDropped <= MaxBroadcastDropUrls) broadcast(dropped) else dropped
    val reused = prevFillsRaw.join(dropSide,
      prevFillsRaw("prov.url") === col("_drop_url"), "left_anti")
      .as[SlotFill]
    IncrementalFills(
      reused.unionByName(mentionFills(spark, sentences(spark, redo))),
      delta, redoCount)
  }

  /** Broadcast ceiling for the dropped-url anti-join side (~50 B/url →
   *  ≤ ~250 MB in the executor); above it the anti-join shuffles, which
   *  is the right plan once the crawl delta itself is cluster-sized. */
  val MaxBroadcastDropUrls = 5000000L

  @volatile private var lastIncrementalDelta: DataFrame = null

  /** Drop the (url, status) delta cached by the last [[incrementalFills]]
   *  call (safe to call any time after its returned Dataset — and any
   *  plan derived from it — has been materialized). */
  def releaseIncrementalDelta(): Unit = {
    val d = lastIncrementalDelta
    if (d != null) {
      lastIncrementalDelta = null
      if (!d.sparkSession.sparkContext.isStopped) d.unpersist()
    }
  }

  /** Full run; with a TableIO each stage checkpoints (with per-partition
   *  lineage columns) and the job resumes from the latest committed
   *  snapshot; per-stage metrics land in a `metrics` table.
   *  `classifier` selects the scoring path: "lr" (default — one-vs-all
   *  LR per mention + noisy-or bag merge + y gate, the reference's
   *  default output mode) or "miml" (frozen fold-EM MIML-RE bag
   *  inference via [[mentionFillsMiml]]; bag scores arrive merged and
   *  thresholded, so the LR y gate is skipped and the bag aggregation
   *  is an identity merge). */
  def run(spark: SparkSession, pages: Dataset[Page],
          io: Option[TableIO] = None,
          runId: String = "run-0",
          dedup: Boolean = false,
          classifier: String = "lr"): Dataset[Triple] = {
    require(classifier == "lr" || classifier == "miml",
      s"unknown classifier '$classifier' (expected lr | miml)")
    import spark.implicits._
    // refuse to resume snapshots written by an incompatible pipeline
    // layout — the classifier is part of the version (r6 advice fix): a
    // run dir written under classifier="lr" would otherwise silently
    // serve LR-scored fills_raw/fills_merged snapshots to a
    // classifier="miml" resume (same tables, different meaning)
    io.foreach(_.ensureVersion(s"$PipelineVersion-$classifier"))
    val metrics = Seq.newBuilder[(String, String, Long, Long)]
    def ckpt[T](table: String, ds: => Dataset[T], parts: Seq[String] = Nil)
               (implicit enc: org.apache.spark.sql.Encoder[T]): Dataset[T] =
      io match {
        case Some(t) =>
          t.read(table) match {
            case Some(df) => df.drop("_part_id", "_run_id").as[T]
            case None =>
              val t0 = System.nanoTime()
              // per-partition lineage: which run wrote which partition
              val df = t.write(table, ds.toDF()
                .withColumn("_part_id", spark_partition_id())
                .withColumn("_run_id", lit(runId)), parts)
              metrics += ((runId, table, df.count(),
                (System.nanoTime() - t0) / 1000000L))
              df.drop("_part_id", "_run_id").as[T]
          }
        case None => ds
      }
    // optional stage 0: crawl dedup — only the kept-page COUNT is
    // checkpoint-worthy (the pages themselves flow straight into NLP;
    // re-deduping on resume is cheaper than snapshotting the corpus)
    val input =
      if (!dedup) pages
      else {
        val kept = dedupPages(spark, pages)
        if (io.isDefined) {
          // persist: the metric count and the NLP scan both consume it
          // (run's tail clearCache() releases the blocks)
          kept.persist()
          metrics += ((runId, "dedup_pages_kept", kept.count(), 0L))
        }
        kept
      }
    val sents = ckpt("sentences", sentences(spark, input))
    // both classifier paths include the fused row-local unary pass (X1-X12)
    val raw = ckpt("fills_raw",
      if (classifier == "miml") mentionFillsMiml(spark, sents)
      else mentionFills(spark, sents))
    // LR runs the reference's default output mode (noisy-or merge + the
    // per-relation y gate); MIML fills are already bag-level and
    // thresholded, so only the (identity) merge runs — it also collapses
    // any exact duplicates a resumed/unioned fills_raw snapshot may hold
    val bags = ckpt("fills_merged",
      if (classifier == "miml") aggregateBags(spark, raw)
      else yThenNoisyOrGate(spark, aggregateBags(spark, raw)))
    if (io.isDefined)
      metrics += ((runId,
        if (classifier == "miml") "bag_mode_miml" else "bag_mode_y_then_noisy_or",
        1L, 0L))
    // linking + symmetric expansion land together in fills_linked; the
    // global X13-X18 pass runs on CANONICAL subjects (reference order:
    // merge -> symmetric -> pass 2)
    Linker.lastAliasCount = -1L
    val link = ckpt("fills_linked",
      symmetricExpand(spark, linked(spark, bags)))
    // link-resolution telemetry (north_star metric): how many surface
    // names the alias dictionary rewrote this run (-1 = stage resumed
    // from its snapshot, nothing recomputed), the raw pair count, the
    // driver/distributed threshold, and which path ran (VERDICT r2 #2)
    if (io.isDefined && Linker.lastAliasCount >= 0L) {
      metrics += ((runId, "link_aliases", Linker.lastAliasCount, 0L))
      metrics += ((runId, "link_alias_pairs", Linker.lastPairCount, 0L))
      metrics += ((runId, "link_driver_pair_threshold",
        Linker.MaxDriverAliasPairs, 0L))
      metrics += ((runId, "link_path_distributed",
        if (Linker.lastDistributed) 1L else 0L, 0L))
    }
    // stages 7+8 fused: one shuffle carries consistency AND the triple
    // materialize (consistentTriples) — the triples table remains the
    // resumable snapshot
    val out = ckpt("triples", consistentTriples(spark, link), Seq("pred"))
    io.foreach { t =>
      val ms = metrics.result()
      if (ms.nonEmpty)
        t.write("metrics", ms.toDF("run_id", "stage", "rows", "millis")
          .withColumn("rows_per_sec",
            col("rows") / greatest(col("millis"), lit(1L)) * 1000))
      // north_star per-partition extraction metrics: mentions/partition and
      // triples/partition, read off the `_run_id`/`_part_id` lineage columns
      // the snapshots carry (a column-pruned 2-column scan + one small agg;
      // checkpointed path only — the bench hot loop runs with io=None)
      val perPart = Seq("fills_raw" -> "mentions", "triples" -> "triples")
        .flatMap { case (table, stage) =>
          t.read(table).map(df => df.groupBy("_run_id", "_part_id").count()
            .select(col("_run_id").as("run_id"), lit(stage).as("stage"),
              col("_part_id").cast("int").as("part_id"),
              col("count").as("rows")))
        }
      if (perPart.nonEmpty)
        t.write("metrics_partitions",
          perPart.reduce(_ unionAll _).as[StageMetric].toDF())
      // every stage is materialized in its snapshot table by now — drop
      // the linker's intra-run persists so repeated checkpointed runs in
      // one session don't accumulate cached blocks
      Linker.release()
      spark.sharedState.cacheManager.clearCache()
    }
    out
  }
}
