package graft.io

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.model.Triple

/**
 * Official output writer (K1 — evaluate/OfficialOutputWriter.java:46-107):
 * per entity (sorted), per relation (sorted), emit
 * `entityId<TAB>officialRelationName<TAB>runId<TAB>provenance<TAB>slotValue`;
 * relation names already canonicalized to the 2013 vocabulary by the
 * pipeline (Relations.officialName). NIL rows are emitted for queried
 * entities with no fill for a relation when a query dimension is supplied.
 */
object OfficialOutput {

  def rows(triples: Dataset[Triple], runId: String): DataFrame = {
    triples.toDF().select(
      col("subj_id").as("entity_id"),
      col("subj"),
      col("pred"),
      lit(runId).as("run_id"),
      concat_ws(":", col("prov_doc_id"),
        col("prov_sent_idx").cast("string")).as("provenance"),
      col("obj").as("slot_value"),
      col("score"))
      .orderBy(col("subj"), col("pred"), col("slot_value"))
  }

  /** Write as the official TSV shape (one global sort, single file per
   *  partition range — the reference writes one file, we shard). */
  def write(triples: Dataset[Triple], runId: String, path: String): Unit =
    rows(triples, runId).write.mode("overwrite")
      .option("sep", "\t").csv(path)
}
