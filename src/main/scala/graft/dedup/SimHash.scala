package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SimHash near-duplicate fingerprinting over a text column.
 *
 * 64-bit simhash: each token hashes to 64 bits — the FIRST 16 HEX CHARS OF
 * md5(token), so the fingerprint is reproducible by any engine with a
 * standard md5 (the DuckDB oracle recomputes it bit-for-bit via hex-digit
 * arithmetic; an earlier FNV-1a variant was oracle-opaque). Bit votes are
 * summed over the token multiset; fingerprint bit = sign of vote. Near-dups
 * = fingerprints within small Hamming distance — candidate pairs found via
 * 4 × 16-bit band equi-joins (any pair within Hamming ≤ 3 shares at least
 * one exact band by pigeonhole), never all-pairs. Degenerate band values
 * (e.g. thousands of empty-ish docs voting to the same fingerprint) are
 * CAPPED per band at `maxBucket` members — the same cap-and-degrade-
 * linearly policy as Linker.MaxBlock — so no band value can go quadratic.
 */
object SimHash {

  /** Default per-band bucket cap for the pair join: members beyond the cap
   *  (in doc_id order) don't generate pairs from that band — bounded recall
   *  loss on a degenerate band value instead of an O(n²) task. */
  val MaxBand = 256

  private val md5Local =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 bytes of md5(s), big-endian — i.e. the first 16 hex chars of
   *  the md5 digest read as an unsigned 64-bit value (two's-complement in
   *  the Long). */
  def md5hash64(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = md5hash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // empty tokens are dropped on BOTH sides (oracle mirrors with word <> '')
  // so split-semantics differences on doubled spaces can't skew the votes
  private val simhashUdf = udf((text: String) =>
    simhash64(text.split(" ").iterator.filter(_.nonEmpty).toSeq))

  /** doc_id, simhash, its unsigned 32-bit halves (sim_hi/sim_lo — the
   *  sign-free form the DuckDB oracle reproduces), and the 4 16-bit bands
   *  (LSH keys). */
  def simhashDF(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), simhashUdf(col("text")).as("simhash"))
      .withColumn("sim_hi", shiftrightunsigned(col("simhash"), 32))
      .withColumn("sim_lo", col("simhash").bitwiseAND(lit(0xFFFFFFFFL)))
      .withColumn("band0", (col("simhash")).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band1", shiftrightunsigned(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band2", shiftrightunsigned(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band3", shiftrightunsigned(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)))
  }

  /** Near-dup candidate pairs within Hamming distance maxDist, via banded
   *  equi-joins (shuffle on band key, the 100-TB-safe plan). Each band's
   *  join legs are capped at `maxBucket` members per band value (doc_id
   *  order, deterministic): a degenerate band value is a linear scan plus
   *  at most maxBucket² pairs, never an unbounded quadratic task. */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 3,
                   maxBucket: Int = MaxBand): DataFrame = {
    val f = simhashDF(docs)
    val joins = (0 until 4).map { b =>
      val w = Window.partitionBy(col(s"band$b")).orderBy(col("doc_id"))
      val capped = f.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= maxBucket).drop("_rn")
      capped.as("x").join(capped.as("y"),
          col(s"x.band$b") === col(s"y.band$b") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
          col("x.simhash").as("s1"), col("y.simhash").as("s2"))
    }
    val hammingUdf = udf((a: Long, b: Long) => hamming(a, b))
    joins.reduce(_ union _).distinct()
      .withColumn("dist", hammingUdf(col("s1"), col("s2")))
      .filter(col("dist") <= maxDist)
      .select(col("d1"), col("d2"), col("dist"))
  }

  /** Cap audit (the "log the drop" half of cap-and-log): per band, how many
   *  members each band VALUE lost to the cap — join-free, run on demand
   *  beside nearDupPairs when its recall bound matters. */
  def cappedBandStats(docs: DataFrame, maxBucket: Int = MaxBand): DataFrame = {
    val f = simhashDF(docs)
    (0 until 4).map { b =>
      f.groupBy(col(s"band$b").as("band_value"))
        .agg(count(lit(1)).as("members"))
        .withColumn("band", lit(b))
        .withColumn("dropped",
          greatest(col("members") - maxBucket, lit(0L)))
    }.reduce(_ unionByName _)
      .filter(col("dropped") > 0)
      .select(col("band"), col("band_value"), col("members"), col("dropped"))
  }
}
