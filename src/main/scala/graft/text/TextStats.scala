package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis column builders for training-data pipelines: token
 * counting, quality scoring, language-ID heuristic, fingerprinting.
 * All built-in column expressions (whole-stage-codegen'd, no UDFs);
 * mirrored 1:1 by the DuckDB oracles of q13/q14/q16/q17.
 */
object TextStats {

  /** whitespace-run token count. */
  def tokenCount(text: Column): Column =
    regexp_count(text, lit("\\S+")).cast("int")

  /** BPE-ish subword count: word-piece boundaries approximated by
   *  letter-digit/case transitions + punctuation (regex only). */
  def subwordCount(text: Column): Column =
    regexp_count(text,
      lit("[A-Z]?[a-z]+|[A-Z]+(?![a-z])|\\d+|[^\\sA-Za-z0-9]")).cast("int")

  def alphaChars(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", ""))

  /** Quality features: alpha ratio, space ratio, mean word length. */
  def quality(df: DataFrame, text: String = "text"): DataFrame = {
    val t = col(text)
    val alpha = alphaChars(t)
    val toks = tokenCount(t)
    df.withColumn("n_tokens", toks)
      .withColumn("alpha_ratio", alpha.cast("double") / length(t))
      .withColumn("mean_word_len",
        alpha.cast("double") / greatest(toks, lit(1)))
      .withColumn("quality_ok",
        col("alpha_ratio") > 0.6 && toks >= 5 && col("mean_word_len") < 15)
  }

  /** Stopword-ladder language id (deterministic; matches q17's oracle). */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    def anyOf(ws: String*) = ws.map(w => padded.contains(s" $w "))
      .reduce(_ || _)
    when(text.rlike("[\\u4e00-\\u9fff]"), "zh")
      .when(anyOf("der", "und", "die"), "de")
      .when(anyOf("le", "la", "et"), "fr")
      .when(anyOf("el", "los", "y"), "es")
      .when(anyOf("the", "and", "a"), "en")
      .otherwise("und")
  }

  /** Normalized content fingerprint (rolling-hash stand-in: md5 of the
   *  alnum-normalized text — deterministic, join-key friendly). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))
}
