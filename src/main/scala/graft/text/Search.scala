package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text retrieval primitives: the posting-list index build and the
 *  conjunctive keyword search a curation / retrieval pipeline runs over
 *  the crawl (eval-set lookup, targeted subcorpus pulls, keyword
 *  blocklists with evidence). */
object Search {

  /** Flat posting table: one row per (word, doc) with the term frequency.
   *  This IS the inverted index at cluster scale — the nested
   *  ARRAY<STRUCT<doc,tf>> form is a per-word collect_list that a hot
   *  stopword (df ~ corpus size) would turn into one unbounded task; the
   *  flat form keeps every downstream op a keyed shuffle, and a sink can
   *  bucket it by word for O(1) term lookup. ONE map-side-combinable
   *  groupBy over the exploded corpus. */
  def postings(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))

  /** Conjunctive (AND) keyword search: documents containing EVERY query
   *  term, with the matched-term count and total / min term frequency
   *  (min_tf is the classic conjunctive ranking primitive). The literal
   *  isin filter runs inside the scan stage BEFORE any shuffle, so the
   *  only rows that ever move are postings of the query terms themselves;
   *  the (doc, word) tf pass and the per-doc rollup are both
   *  map-side-combinable groupBys. A 10^12-doc corpus shuffles
   *  O(matching postings), never O(tokens). */
  def searchAll(docs: DataFrame, terms: Seq[String],
                textCol: String = "text"): DataFrame = {
    val uniq = terms.distinct
    require(uniq.nonEmpty, "searchAll needs at least one term")
    docs.select(col("doc_id"), explode(split(col(textCol), " ")).as("word"))
      .filter(col("word").isin(uniq: _*))
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("total_tf"),
        min(col("tf")).as("min_tf"))
      .filter(col("n_terms") === uniq.size)
  }
}
