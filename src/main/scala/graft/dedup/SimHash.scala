package graft.dedup

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * SimHash near-duplicate fingerprinting over a text column.
 *
 * 64-bit simhash: each token hashes to 64 bits (FNV-1a, deterministic, no
 * JVM hashCode dependence); bit votes are summed; fingerprint bit = sign of
 * vote. Near-dups = fingerprints within small Hamming distance — candidate
 * pairs found via 4 × 16-bit band equi-joins (any pair within Hamming ≤ 3
 * shares at least one exact band by pigeonhole), never all-pairs.
 */
object SimHash {

  def fnv64(s: String): Long = {
    var h = -3750763034362895579L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 1099511628211L; i += 1 }
    h
  }

  def simhash64(tokens: Iterable[String]): Long = {
    val votes = new Array[Int](64)
    tokens.foreach { t =>
      val h = fnv64(t)
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

  private val simhashUdf = udf((text: String) =>
    simhash64(text.split(" ").toSeq))

  /** doc_id, simhash, and the 4 16-bit bands (LSH keys). */
  def simhashDF(docs: DataFrame): DataFrame = {
    docs.select(col("doc_id"), simhashUdf(col("text")).as("simhash"))
      .withColumn("band0", (col("simhash")).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band1", shiftrightunsigned(col("simhash"), 16).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band2", shiftrightunsigned(col("simhash"), 32).bitwiseAND(lit(0xFFFFL)))
      .withColumn("band3", shiftrightunsigned(col("simhash"), 48).bitwiseAND(lit(0xFFFFL)))
  }

  /** Near-dup candidate pairs within Hamming distance maxDist, via banded
   *  equi-joins (shuffle on band key, the 100-TB-safe plan). */
  def nearDupPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val f = simhashDF(docs)
    val joins = (0 until 4).map { b =>
      f.as("x").join(f.as("y"),
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
}
