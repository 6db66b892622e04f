package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable sketch estimators for corpus-level statistics that would
 *  otherwise need a full shuffle of the raw domain. */
object Sketches {

  /** KMV (k-minimum-values) distinct-count sketch over the corpus
   *  vocabulary (Bar-Yossef et al. 2002, the estimator HLL generalizes):
   *  hash every token to the first 48 bits of its md5, keep the k
   *  smallest DISTINCT hash values; with hashes uniform on [0, 2^48),
   *  the k-th smallest h_k estimates the distinct count as
   *  (k-1) * 2^48 / h_k.
   *
   *  Determinism: md5 is the one hash both engines share; 48 bits keeps
   *  every value below 2^53, and k ≤ 32 keeps (k-1)*2^48 double-exact, so
   *  the single division is one IEEE op both engines round identically.
   *  Same-hash words collapse BEFORE the k-min (that is the sketch's
   *  definition, and a 48-bit collision folds identically on both
   *  engines).
   *
   *  Scale shape: the k-min is orderBy+limit — TakeOrdered per-partition
   *  heaps, which is exactly the sketch's mergeability (union the
   *  per-partition k-mins, keep the k smallest) — never a global sort.
   *  The preceding distinct is a map-side-combinable shuffle of 8-byte
   *  keys. `exact_distinct` is emitted for verification/calibration; a
   *  production run drops that column and with it the only full
   *  vocabulary aggregate. */
  def kmvDistinctWords(docs: DataFrame, k: Int = 16,
                       textCol: String = "text"): DataFrame = {
    require(k >= 2 && k <= 32, "k in [2,32] keeps (k-1)*2^48 double-exact")
    val h = docs.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .select(conv(substring(md5(col("word")), 1, 12), 16, 10)
        .cast("long").as("h"))
      .distinct()
    val mins = h.orderBy(col("h").asc).limit(k)
      .agg(count(lit(1)).as("k_actual"), max(col("h")).as("kth_hash"))
    val exact = h.agg(count(lit(1)).as("exact_distinct"))
    mins.crossJoin(exact).select(
      col("k_actual"), col("kth_hash"),
      (lit((k - 1).toDouble * 281474976710656.0) /
        col("kth_hash").cast("double")).as("estimate"),
      col("exact_distinct"))
  }
}
