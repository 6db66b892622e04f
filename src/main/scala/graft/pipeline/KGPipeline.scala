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

  /** Stage 1: NLP annotate (tokenize/ssplit/pos/ner/coref), early gates
   *  inside the partition (lang + length — Catalyst can't invent these). */
  def sentences(spark: SparkSession, pages: Dataset[Page]): Dataset[Sentence] = {
    import spark.implicits._
    pages.filter(p => Annotator.admits(p.lang, p.text))
      .mapPartitions(_.flatMap(Annotator.annotate))
  }

  /** Stages 2-4: mentions -> candidate pairs -> per-mention scores, fused in
   *  one narrow pass (no shuffle). */
  def mentionFills(spark: SparkSession, sents: Dataset[Sentence]): Dataset[SlotFill] = {
    import spark.implicits._
    sents.mapPartitions(_.flatMap(s =>
      Candidates.fromSentence(s).flatMap(Scorer.toFills)))
  }

  /** Stage 5: bag aggregation — merge per-mention scores for the same
   *  (KBPair, relation) via noisy-or (common/Utils.java:287-291,
   *  JointBayesRelationExtractor.java:2037-2051), keeping the
   *  highest-scoring mention's provenance (P1 as a column —
   *  SimpleSlotFiller.findBestProvenance without a second pass). */
  def aggregateBags(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    fills.toDF()
      .groupBy($"subj", $"subj_type", $"pred", $"obj", $"obj_type")
      .agg(
        // log-domain noisy-or: 1 - prod(1-p); p=1 contributes -inf -> 1.0.
        // Rounded to 12 decimals: log1p terms sum in partition-arrival
        // order, and downstream orderings compare scores EXACTLY — the
        // rounding restores determinism under any parallelism.
        round(lit(1.0) - exp(sum(log1p(-least($"score", lit(1.0))))), 12).as("score"),
        // deterministic argmax provenance: struct ordering = (score, prov)
        max(struct($"score", $"prov")).getField("prov").as("prov"))
      .select($"subj", $"subj_type", $"pred", $"obj", $"obj_type",
        least($"score", lit(1.0)).as("score"), $"prov")
      .as[SlotFill]
  }

  /** Stage 5b: unary consistency (X1-X12 per-fill checks) — row-local,
   *  fused into the same stage as the bag aggregation's output. */
  def unary(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    fills.flatMap(Consistency.unaryOne)
  }

  /** Stage 6: entity linking + canonicalization (G2). */
  def linked(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] =
    Linker.canonicalize(spark, fills)

  /** Stage 7: per-entity global consistency (X13-X18), grouped by CANONICAL
   *  subject (post-linking — InferentialSlotFiller.java:122-165 order). */
  def consistent(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    fills.groupByKey(_.subj)
      .flatMapGroups((_, it) => Consistency.entityPass(it.toSeq))
  }

  /** Symmetric relations (G4, SymmetricFunctionRewritePostProcessor):
   *  reverse edges for spouse/siblings/other_family/alternate_names. */
  private val symmetricPreds = Set("per:spouse", "per:siblings",
    "per:other_family", "per:alternate_names", "org:alternate_names")

  def symmetricExpand(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    val rev = fills.filter(f => symmetricPreds.contains(f.pred) &&
        f.subj_type == f.obj_type && NER.isEntityType(f.obj_type))
      .map(f => f.copy(subj = f.obj, obj = f.subj))
    fills.unionByName(rev)
  }

  /** Stage 8: graph materialize — edge merge by noisy-or
   *  (EntityGraph.mergeEdges, evaluate/EntityGraph.java:85-100), official
   *  2013 relation rename (K1 — the canonicalization named in north_rule),
   *  then Triple rows. */
  def triples(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[Triple] = {
    import spark.implicits._
    val renamed = fills.map(f => f.copy(pred = Relations.officialName(f.pred)))
    renamed.toDF()
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

  /** Full run; with a TableIO each stage checkpoints (with per-partition
   *  lineage columns) and the job resumes from the latest committed
   *  snapshot; per-stage metrics land in a `metrics` table. */
  def run(spark: SparkSession, pages: Dataset[Page],
          io: Option[TableIO] = None,
          runId: String = "run-0"): Dataset[Triple] = {
    import spark.implicits._
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
    val sents = ckpt("sentences", sentences(spark, pages))
    val raw = ckpt("fills_raw", mentionFills(spark, sents))
    val bags = ckpt("fills_merged", aggregateBags(spark, raw))
    // unary is row-local (not checkpointed); linking + symmetric expansion
    // land together in fills_linked; the global X13-X18 pass runs on
    // CANONICAL subjects (reference order: merge -> symmetric -> pass 2)
    val link = ckpt("fills_linked",
      symmetricExpand(spark, linked(spark, unary(spark, bags))))
    val cons = ckpt("fills_consistent", consistent(spark, link))
    val out = ckpt("triples", triples(spark, cons), Seq("pred"))
    io.foreach { t =>
      val ms = metrics.result()
      if (ms.nonEmpty)
        t.write("metrics", ms.toDF("run_id", "stage", "rows", "millis")
          .withColumn("rows_per_sec",
            col("rows") / greatest(col("millis"), lit(1L)) * 1000))
    }
    out
  }
}
