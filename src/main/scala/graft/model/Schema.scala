package graft.model

/**
 * Row types for every stage table of the KG-construction dataflow
 * (SURVEY.md §1.1, §7 "stage tables"). Each is a case class so Spark derives
 * a Product Encoder; columns stay flat/nested-struct (never MapType) so the
 * plan stays whole-stage-codegen-friendly downstream of the NLP stage.
 *
 * Reference data model: common/KBPEntity.java:13-24, KBPair.java:11-70,
 * KBTriple.java:8-37, KBPSlotFill.java:9-50, ir/KBPRelationProvenance.java:29-107.
 */

/** Input row — BASELINE.json input_hint:
 *  (url, warc_ts, html binary, text, lang). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** One annotated token (CoreLabel subset we need; SURVEY.md §1.3). */
final case class Token(
    word: String,       // tokenized form
    orig: String,       // original text slice (byte-identity invariant source)
    begin: Int,         // char offset in sentence text
    end: Int,
    pos: String,        // lite POS tag (NNP/NN/CD/JJ/IN/DT/RB/EX/POS/CC/PRP/...)
    ner: String,        // NER.* or "O"
    antecedent: String, // coref antecedent ("" if none)
    timex: String)      // normalized TIMEX value for DATE tokens ("" if none)

/** One sentence row after the mapPartitions NLP stage. */
final case class Sentence(
    url: String,
    doc_id: String,
    sent_idx: Int,
    text: String,
    tokens: Seq[Token])

final case class Span(b: Int, e: Int) // token-index span, [b, e)

/** Entity or slot mention (kind: "entity" | "slot"). */
final case class Mention(
    url: String,
    doc_id: String,
    sent_idx: Int,
    kind: String,
    b: Int,
    e: Int,
    ner: String,
    surface: String,
    normalized: String) // antecedent/timex-normalized form

/** Row-level lineage carried on every candidate/triple
 *  (ir/KBPRelationProvenance.java:29-107). */
final case class Provenance(
    doc_id: String,
    url: String,
    sent_idx: Int,
    ent_b: Int, ent_e: Int,
    slot_b: Int, slot_e: Int)

/** Candidate (entity mention, slot mention) pair — KBPair semantics:
 *  identity on (entity, slotValue) (common/KBPair.java:72-90). */
final case class Candidate(
    subj: String,
    subj_type: String,     // PERSON | ORGANIZATION
    obj: String,           // normalized slot value
    obj_surface: String,
    obj_type: String,      // slot NER type
    url: String,
    doc_id: String,
    sent_idx: Int,
    ent_b: Int, ent_e: Int,
    slot_b: Int, slot_e: Int,
    features: Seq[String], // sparse binary feature vector (FeatureFactory)
    between: Seq[String])  // lowercased words between the spans (X5/X10/X11
                           // between-window checks; narrow-stage only)

/** A scored (pair, relation) before consistency — KBPSlotFill. */
final case class SlotFill(
    subj: String,
    subj_type: String,
    pred: String,
    obj: String,
    obj_type: String,
    score: Double,
    prov: Provenance)

/** Final canonical triple row; `triples` table partitioned by pred. */
final case class Triple(
    subj: String,
    subj_id: String,
    subj_type: String,
    pred: String,
    obj: String,
    obj_id: String,
    obj_type: String,
    score: Double,
    prov_doc_id: String,
    prov_url: String,
    prov_sent_idx: Int)

/** Per-partition stage metrics (north_star: triples/partition, alongside
 *  the run-level `metrics` table's mentions/sec and link-resolution rate).
 *  Rows are derived from the `_run_id`/`_part_id` lineage columns every
 *  checkpointed stage snapshot carries; written to the
 *  `metrics_partitions` table by [[graft.pipeline.KGPipeline.run]]. */
final case class StageMetric(
    run_id: String,
    stage: String,
    part_id: Int,
    rows: Long)
