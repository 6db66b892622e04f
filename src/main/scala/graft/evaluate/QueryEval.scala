package graft.evaluate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Relations, Triple}
import graft.sources.Readers.QueryEntity

/**
 * The query-driven evaluation loop — the reference's flagship entry point
 * (evaluate/KBPEvaluator.java:116-155): query XML -> per-entity slot fills
 * -> official output WITH NIL rows (OfficialOutputWriter.java:46-107) ->
 * P/R vs the gold key.
 *
 * All per-query dimensions (queries, ignore lists, KB) are tiny; every join
 * against the triples table is a broadcast join on the query side, so this
 * scales as one scan of the (pred-partitioned) triples table.
 */
object QueryEval {

  /** Canonical relation name for matching (collapses official/year names). */
  private val canonicalUdf = udf((p: String) =>
    Relations.fromString(p).map(_.name).getOrElse(p))

  /** Restrict triples to the queried entities, tagging each row with its
   *  query_id (broadcast semi-join on the query dimension). */
  def restrictToQueries(spark: SparkSession, triples: Dataset[Triple],
                        queries: Dataset[QueryEntity]): DataFrame = {
    val q = queries.toDF().select(col("query_id"), col("name").as("subj"),
      col("ent_type").as("subj_type"))
    triples.toDF().join(broadcast(q), Seq("subj", "subj_type"))
  }

  /** X3 FilterIgnoredSlots (HeuristicSlotfillPostProcessors.java:89-98):
   *  drop fills whose relation is listed in the query's <ignore> block.
   *  Anti-join on (query_id, canonical pred). */
  def filterIgnored(spark: SparkSession, fills: DataFrame,
                    queries: Dataset[QueryEntity]): DataFrame = {
    import spark.implicits._
    val ignores = queries.flatMap(q => q.ignored_preds.map(p =>
        (q.query_id, Relations.fromString(p).map(_.name).getOrElse(p))))
      .toDF("query_id", "pred_c")
    fills.withColumn("pred_c", canonicalUdf(col("pred")))
      .join(broadcast(ignores), Seq("query_id", "pred_c"), "left_anti")
      .drop("pred_c")
  }

  /** Contiguous lowercase-token containment
   *  (CoreMapUtils.contained semantics used by X6). */
  def contained(a: String, b: String): Boolean = {
    val ta = a.toLowerCase.split(" ").toSeq
    val tb = b.toLowerCase.split(" ").toSeq
    tb.containsSlice(ta) || ta.containsSlice(tb)
  }

  /** X6 FilterAlreadyKnownSlots (HeuristicSlotfillPostProcessors.java:
   *  101-134): kill fills whose value exactly matches or token-contains any
   *  KB value already known for the entity; alternate names additionally
   *  may not equal the pivot or be a single-token prefix/suffix of it. */
  def filterAlreadyKnown(spark: SparkSession, fills: DataFrame,
                         kb: DataFrame): DataFrame = {
    val containsUdf = udf((a: String, b: String) =>
      a.equalsIgnoreCase(b) || contained(a, b))
    val kbVals = kb.select(col("subj"), col("obj").as("kb_obj")).distinct()
    val kills = fills.join(broadcast(kbVals), Seq("subj"))
      .filter(containsUdf(col("obj"), col("kb_obj")))
      .select("subj", "pred", "obj").distinct()
    val altNameKill = (col("pred").isin("per:alternate_names",
        "org:alternate_names") ||
        canonicalUdf(col("pred")).isin("per:alternate_names",
          "org:alternate_names")) &&
      (lower(col("obj")) === lower(col("subj")) ||
        (col("subj_type") === "PERSON" && !col("obj").contains(" ") &&
          (lower(col("subj")).startsWith(lower(col("obj"))) ||
            lower(col("subj")).endsWith(lower(col("obj"))))))
    fills.filter(!altNameKill)
      .join(kills, Seq("subj", "pred", "obj"), "left_anti")
  }

  /** K1 official output with NIL rows (OfficialOutputWriter.java:46-107):
   *  one row per surviving fill, and for every (query, relation-of-its-
   *  type) with no fill a single NIL row; relation names are already the
   *  official 2013 vocabulary (the pipeline renames at triples()); globally
   *  sorted by (query, relation, slot). */
  def officialRows(spark: SparkSession, fills: DataFrame,
                   queries: Dataset[QueryEntity], runId: String): DataFrame = {
    import spark.implicits._
    val rels = Relations.all
      .map(m => (m.entityType, Relations.officialName(m.name))).distinct
      .toDF("ent_type", "pred")
    val expected = queries.toDF().select($"query_id", $"ent_type")
      .join(broadcast(rels), Seq("ent_type"))
      .select($"query_id", $"pred")
    val got = fills.select($"query_id", $"pred",
      concat_ws(":", $"prov_doc_id", $"prov_sent_idx".cast("string"))
        .as("provenance"),
      $"obj".as("slot_value"))
    broadcast(expected).join(got, Seq("query_id", "pred"), "left")
      .select($"query_id", $"pred", lit(runId).as("run_id"),
        coalesce($"provenance", lit("NIL")).as("provenance"),
        coalesce($"slot_value", lit("NIL")).as("slot_value"))
      .orderBy($"query_id", $"pred", $"slot_value")
  }

  /** T8: P/R/F1 of the official rows vs a gold key (CustomSFScore
   *  semantics on (query, relation, slot); judgement 1 = CORRECT). */
  def prfVsGold(spark: SparkSession, official: DataFrame,
                gold: DataFrame): DataFrame = {
    val got = official.filter(col("slot_value") =!= "NIL")
      .select(col("query_id").as("subj"),
        canonicalUdf(col("pred")).as("pred"),
        lower(col("slot_value")).as("obj"))
    val want = gold.filter(col("correct"))
      .select(col("query_id").as("subj"),
        canonicalUdf(col("relation")).as("pred"),
        lower(col("slot_value")).as("obj"))
    Evaluate.prf(spark, got, want)
  }

  /** The full query-driven loop (KBPEvaluator.java:116-155): restrict ->
   *  X3 -> X6 -> official rows with NILs. */
  def run(spark: SparkSession, triples: Dataset[Triple],
          queries: Dataset[QueryEntity], kb: Option[DataFrame] = None,
          runId: String = "graft-run"): DataFrame = {
    val mine = restrictToQueries(spark, triples, queries)
    val x3 = filterIgnored(spark, mine, queries)
    val x6 = kb.map(filterAlreadyKnown(spark, x3, _)).getOrElse(x3)
    officialRows(spark, x6, queries, runId)
  }
}
