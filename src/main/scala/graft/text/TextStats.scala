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

  /** BPE-ish subword count (q13): word-piece boundaries approximated by
   *  case transitions, digit runs and punctuation — the GPT-2-style
   *  pre-tokenizer shape, kept lookahead-free so DuckDB's RE2 engine
   *  recomputes the identical count for the oracle (leftmost-first
   *  alternation is the same in Java regex and RE2). */
  def subwordCount(text: Column): Column =
    regexp_count(text,
      lit("[A-Z]?[a-z]+|[A-Z]+|\\d+|[^\\sA-Za-z0-9]")).cast("int")

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

  /** Normalized content fingerprint (md5 of the alnum-normalized text —
   *  deterministic, join-key friendly). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** TRUE rolling-hash fingerprint (q35): the minimum base-31 Rabin-Karp
   *  polynomial hash over all sliding character k-grams of the
   *  ascii-normalized text — the min-sampled member of the
   *  winnowing/MOSS fingerprint family. Pure column expressions, exact
   *  BIGINT math (k=8 chars at base 31 stays far below 2^63, so no
   *  modulus and no FP), over lowercased [a-z0-9 ] only so the
   *  char-code arithmetic is engine-independent; NULL for texts with
   *  fewer than k normalized chars. Mirrored 1:1 by the q35 oracle. */
  def rollingMin(text: Column, k: Int = 8): Column = {
    val t = regexp_replace(lower(text), "[^a-z0-9 ]", "")
    val windows = transform(sequence(lit(0), length(t) - k), j =>
      (0 until k).map(i =>
        ascii(t.substr(j + lit(i + 1), lit(1))) *
          lit(BigInt(31).pow(k - 1 - i).toLong))
        .reduce(_ + _))
    when(length(t) >= k, array_min(windows)).otherwise(lit(null))
  }
}
