package graft.link

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{SlotFill, Triple}

/**
 * Graph operators over the triples/edge table (SURVEY.md §2.9):
 *  - G1 edge merge by noisy-or (in KGPipeline.triples)
 *  - G3 transitive completion (TransitiveRelationPostProcessor)
 *  - G4 symmetric expansion (in KGPipeline.symmetricExpand)
 *  - G6 connected components (min-label propagation)
 * The in-memory DirectedMultiGraph of the reference
 * (nlp/graph/DirectedMultiGraph.java) is NOT ported: the edge table IS the
 * graph; every op is a bounded sequence of joins.
 */
object GraphOps {

  /** Relations the reference treats as transitive (subsidiary/parent
   *  chains, member chains). */
  val transitivePreds = Set("org:subsidiaries", "org:parents",
    "org:member_of")

  /** G3: bounded transitive completion — depth-limited iterative self-join
   *  (test.graph.inference.depth = 3 in the reference's base.conf). New
   *  edges score = product of the path's scores (noisy chain). */
  def transitiveClosure(spark: SparkSession, edges: DataFrame,
                        preds: Set[String] = transitivePreds,
                        depth: Int = 3): DataFrame = {
    import spark.implicits._
    val base = edges.filter($"pred".isin(preds.toSeq: _*))
      .select($"subj", $"pred", $"obj", $"score").distinct()
    var acc = base
    var accCount = -1L // lazily known; only needed for convergence deltas
    var frontier = base
    var d = 1
    while (d < depth) {
      val next = frontier.as("a")
        .join(base.as("b"),
          $"a.obj" === $"b.subj" && $"a.pred" === $"b.pred" &&
            $"a.subj" =!= $"b.obj")
        .select($"a.subj".as("subj"), $"a.pred".as("pred"),
          $"b.obj".as("obj"), ($"a.score" * $"b.score").as("score"))
        .distinct()
      val fresh = next.join(acc.select($"subj", $"pred", $"obj"),
        Seq("subj", "pred", "obj"), "left_anti").persist()
      val prev = acc
      if (accCount < 0) accCount = prev.count() // materialize round-1 acc
      acc = acc.unionByName(fresh).persist()
      // ONE action on the NEW acc both materializes its cache AND decides
      // convergence (newCount > accCount <=> fresh was non-empty, since
      // fresh is anti-joined against acc). Materializing acc BEFORE
      // unpersisting prev is what keeps later rounds from recomputing the
      // whole accumulated lineage from base (mirrors RuleInference.infer's
      // count-then-unpersist order). fresh stays persisted because it is
      // the next round's frontier.
      val newCount = acc.count()
      val grew = newCount > accCount
      accCount = newCount
      prev.unpersist()
      // the old frontier (last round's fresh) was consumed by this round's
      // join, which newCount just materialized — safe to release now
      if (frontier ne base) frontier.unpersist()
      if (!grew) { fresh.unpersist(); d = depth }
      else { frontier = fresh; d += 1 }
    }
    acc
  }

  /** G6: connected components over an undirected edge list
   *  (src, dst) -> (vertex, component) with component = min vertex id
   *  reachable; min-label propagation (large-scale CC pattern), iterated
   *  TO CONVERGENCE. `maxIter` is a safety valve, not the stopping rule:
   *  propagation needs ~diameter rounds, and a silently-truncated run
   *  would hand the linker a NON-fixpoint labeling (one entity's surface
   *  forms canonicalizing to different representatives with no warning) —
   *  so hitting the cap without convergence FAILS LOUDLY instead of
   *  returning. The default cap covers any plausible alias-graph diameter
   *  (chains longer than 50 hops mean corrupt input, not a real entity). */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          maxIter: Int = 50): DataFrame = {
    import spark.implicits._
    val und = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .distinct().persist()
    var labels = und.select($"src".as("v")).distinct()
      .withColumn("comp", $"v")
    var changed = true
    var i = 0
    while (changed && i < maxIter) {
      val next = und.join(labels.withColumnRenamed("v", "dst")
          .withColumnRenamed("comp", "ncomp"), Seq("dst"))
        .groupBy($"src".as("v")).agg(min($"ncomp").as("minNbr"))
        .join(labels, Seq("v"))
        .select($"v", least($"comp", $"minNbr").as("comp"))
        .persist()
      // ONE action per round: the convergence check is the materializing
      // count (no separate count() job), and the superseded labels'
      // cache is released before the next round
      val diff = next.join(labels.withColumnRenamed("comp", "old"), Seq("v"))
        .filter($"comp" =!= $"old").count()
      if (i > 0) labels.unpersist()
      labels = next
      changed = diff > 0
      i += 1
    }
    und.unpersist()
    if (changed)
      throw new IllegalStateException(
        s"connectedComponents did not converge within $maxIter rounds " +
          "(labels still changing) — the labeling is NOT a fixpoint and " +
          "using it would silently split entities; raise maxIter or " +
          "inspect the alias graph for a pathological chain")
    labels
  }

  /** C10 within-sentence competition (process/RelationFilter.java:23-160,
   *  PerRelTypeCompetitionFilterComponent): keep only the best-scoring
   *  pair per (sentence, relation) — opt-in, off by default in the
   *  reference (Props.java:289-290). */
  def relationFilter(spark: SparkSession, fills: Dataset[SlotFill]): Dataset[SlotFill] = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"prov.doc_id", $"prov.sent_idx", $"pred")
      .orderBy($"score".desc, $"obj", $"subj")
    fills.toDF().withColumn("_rn", row_number().over(w))
      .filter($"_rn" === 1).drop("_rn").as[SlotFill]
  }
}
