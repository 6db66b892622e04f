package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed suffix-array construction by PREFIX DOUBLING (Manber &
 * Myers 1990's rank-doubling, realized as O(log maxDocLen) keyed Spark
 * shuffles), and the exact duplicated-span mining it powers.
 *
 * This is the EXACT-substring complement to `NearDup.dupSpans` (which
 * approximates Lee et al. 2021's suffix-array dedup at one fixed span
 * length): the suffix array surfaces duplicated spans of ANY length —
 * suffixes adjacent in rank order with a long common prefix ARE the
 * duplicated spans, and every repeat of a span is a contiguous rank
 * interval.
 *
 * Suffix universe: every (doc_id, off), the suffix being text[off:] of
 * ITS OWN document — no corpus concatenation and no cross-document
 * sentinel artifacts (a suffix never "continues" into another doc,
 * which is the semantics substring dedup wants). Equal suffix strings
 * share a rank; a proper prefix sorts before its extensions (the
 * missing-half rank −1 rule). Both properties make the final ranks
 * EXACTLY `dense_rank() OVER (ORDER BY suffix-string)` — which is how
 * the DuckDB oracle restates them independently.
 *
 * Scale shape: per doubling round, ONE self-equi-join on
 * (doc_id, off + k) fetches the partner rank, and rank reassignment
 * runs over the DISTINCT (r1, r2) pairs — range-repartitioned, sorted
 * within partitions, order-consistent ids from
 * monotonically_increasing_id (partition ids ascend with the ranges;
 * the distinct collapsed equal pairs first, so equality is preserved).
 * Mid-flight ranks are order-ISOMORPHIC, not dense — density is only
 * restored once at the end (one sorted zipWithIndex, the canonical
 * distributed ranking pattern). No global single-partition window
 * anywhere. Rounds = ceil(log2(max doc length)) — a function of
 * DOCUMENT length, not corpus size. The position table is one row per
 * character: a global suffix array over 100 TB of text is 10^14 rows,
 * so at that scale this runs per curation shard (same code over a
 * keyed subset — how suffix-array dedup is deployed in practice); the
 * per-round plan is shard-size-independent.
 */
object SuffixOps {

  /** (doc_id, off, rank): global suffix ranks, dense 1..m over distinct
   *  suffix strings, ties shared by equal suffixes. */
  def suffixRanks(spark: SparkSession, docs: DataFrame,
                  textCol: String = "text"): DataFrame = {
    import spark.implicits._
    // empty (or all-null-text) input: max() aggregates to NULL — default
    // to 0 so the doubling loop no-ops and the result is simply empty
    // (the old head().getInt(0) NPE'd unboxing the null)
    val maxLenRow = docs.agg(max(length(col(textCol)))).head()
    val maxLen = if (maxLenRow.isNullAt(0)) 0 else maxLenRow.getInt(0)
    // initial rank: dense id of the character under Spark's binary
    // UTF-8 string order (== DuckDB's collation; the alphabet is tiny)
    val chars = docs
      .select(col("doc_id"), posexplode(split(col(textCol), "")))
      .filter($"col" =!= "") // split-by-empty-regex emits a trailing ""
      .select($"doc_id", $"pos".cast("long").as("off"), $"col".as("c"))
    val charRanks = denseIds(chars.select($"c").distinct(), Seq("c"))
      .withColumnRenamed("_id", "rank")
    var cur = chars.join(charRanks, Seq("c")).drop("c").persist()
    cur.count()
    var k = 1L
    while (k < maxLen) {
      val right = cur.select($"doc_id", ($"off" - k).as("off"),
        $"rank".as("r2"))
      // partner rank at off+k; a suffix shorter than 2k has none → −1,
      // below every real rank, so a proper prefix stays strictly before
      // its extensions — exactly string order
      val paired = cur.select($"doc_id", $"off", $"rank".as("r1"))
        .join(right, Seq("doc_id", "off"), "left")
        .na.fill(-1L, Seq("r2"))
      val ids = paired.select($"r1", $"r2").distinct()
        .repartitionByRange($"r1", $"r2")
        .sortWithinPartitions($"r1", $"r2")
        .withColumn("_nr", monotonically_increasing_id())
      // plan barrier + persist per round (the GraphOps CC pattern): the
      // round's plan references `cur` four times, so with persist alone
      // the CATALYST PLAN re-nests ~4x per round — exponential growth
      // that OOMs the AQE explain-string builder long before the data
      // is big. The barrier truncates the plan; persist+count
      // materializes the mono-id ranks ONCE (a recomputation would
      // regenerate different ids) before the parent is released.
      val next = planBarrier(spark, paired.join(ids, Seq("r1", "r2"))
        .select($"doc_id", $"off", $"_nr".as("rank")))
        .persist()
      next.count()
      cur.unpersist()
      cur = next
      k *= 2
    }
    // densify once: ranks -> 1..m preserving order and equality.
    // localCheckpoint MATERIALIZES the result before cur is unpersisted:
    // the mid-flight ranks are monotonically_increasing_id values, which
    // a recomputation would regenerate differently — the join sides must
    // never observe two different recomputations (the bug the banana
    // spec caught: unpersist-before-materialize lost 5 of 6 rows).
    val dense = denseIds(cur.select($"rank").distinct(), Seq("rank"))
    val out = cur.join(dense, Seq("rank"))
      .select($"doc_id", $"off", $"_id".as("rank"))
      .localCheckpoint(true)
    cur.unpersist()
    out
  }

  /** Catalyst-plan barrier: same data, fresh plan (see GraphOps). */
  private def planBarrier(spark: SparkSession, df: DataFrame): DataFrame =
    spark.createDataFrame(df.rdd, df.schema)

  /** Dense order-preserving ids 1..m for a DISTINCT-row frame: sort by
   *  `cols` (range partition, so the order is global) and zipWithIndex —
   *  the canonical distributed ranking; the extra count job zipWithIndex
   *  runs is one pass over the already-shuffled data. */
  private def denseIds(distinctRows: DataFrame,
                       cols: Seq[String]): DataFrame = {
    val spark = distinctRows.sparkSession
    val sorted = distinctRows.orderBy(cols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("_id",
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Exact duplicated spans of length ≥ minLen: group the suffix array
   *  by the first `minLen` characters; every group of size ≥ 2 is a
   *  span occurring `n_occurrences` times anywhere in the corpus
   *  (cross-document or self-repeat). Top-k by (n DESC, span ASC) — a
   *  total order, so the result is deterministic.
   *
   *  Equivalent to walking SA-adjacent pairs with LCP ≥ minLen (all
   *  occurrences of a span form one contiguous rank interval), but
   *  expressed as one hash aggregate on the in-row minLen-prefix — no
   *  LCP pass, no sort, no window; the one subtlety the SA view makes
   *  obvious (a suffix shorter than minLen can never carry a span) is
   *  the length filter. The suffix ARRAY itself is still the primitive
   *  to keep (rank adjacency answers longest-repeat / arbitrary-length
   *  queries; `suffixRanks` is the oracle-pinned part), but span
   *  counting at a KNOWN length needs only the prefix aggregate. */
  def repeatedSpans(spark: SparkSession, docs: DataFrame, minLen: Int,
                    k: Int = 50, textCol: String = "text"): DataFrame = {
    import spark.implicits._
    // r6 (guide §2.3, "shuffle keys and metadata instead of payloads"):
    // the count pass used to shuffle one minLen-char span string PER
    // CHARACTER POSITION of the corpus. Hash-first two-pass instead:
    // (1) count 16-byte unhex(md5(span)) fingerprints — map-side
    // combinable, the exchange carries fixed-width binaries (~minLen/16
    // of the old bytes); (2) re-derive the spans scan-side and keep only
    // those whose fingerprint survived n≥2 (AQE broadcasts the surviving
    // table when it fits; only DUPLICATED span text is ever shuffled, by
    // the deterministic min-per-fingerprint merge). Counts are per md5 —
    // exact up to 128-bit collisions, the same contract the q19 band
    // fingerprints already rely on; the q82 oracle hash-pins equality.
    def spans = docs
      .select(explode(expr(
        s"""transform(sequence(0, greatest(length($textCol) - $minLen, 0)),
            i -> substring($textCol, i + 1, $minLen))""")).as("span"))
      .filter(length($"span") >= minLen)
    val hot = spans
      .groupBy(unhex(md5($"span")).as("_h"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter($"n_occurrences" >= 2)
    spans.select($"span", unhex(md5($"span")).as("_h"))
      .join(hot, Seq("_h"))
      .groupBy($"_h", $"n_occurrences").agg(min($"span").as("span"))
      .select($"span", $"n_occurrences")
      .orderBy($"n_occurrences".desc, $"span").limit(k)
  }

  /** The query only the suffix ARRAY answers without fixing a length
   *  up front: the LONGEST duplicated spans. Adjacent suffixes in rank
   *  order are compared (capped prefix compare, ≤ capChars per pair —
   *  Kasai's linear LCP is inherently sequential; the capped compare is
   *  the shuffle-free distributed form, exact up to the cap, which is
   *  also the longest span the report shows); the top-k (lcp DESC,
   *  span ASC) distinct (span, lcp) rows come back with their adjacent-
   *  pair counts. Adjacency is one range-partitioned sort with
   *  in-partition neighbor pairing; the ≤-one-per-partition boundary
   *  pairs come from a lead() over the per-partition extremes — a
   *  single-partition window over a table bounded by the partition
   *  COUNT (cluster configuration, not data size). */
  def longestRepeats(spark: SparkSession, docs: DataFrame, k: Int = 20,
                     capChars: Int = 200,
                     textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val ranks = suffixRanks(spark, docs, textCol)
    val withSuffix = ranks
      .join(docs.select(col("doc_id"), col(textCol).as("_t")), Seq("doc_id"))
      .select($"rank",
        substring(expr("substring(_t, off + 1)"), 1, capChars).as("sfx"))
    val parts = withSuffix.repartitionByRange($"rank")
      .sortWithinPartitions($"rank")
      .withColumn("_p", spark_partition_id())
    val inPart = parts.select($"rank", $"sfx", $"_p")
      .as[(Long, String, Int)]
      .mapPartitions { it =>
        var prev: String = null
        it.map { case (_, s, _) =>
          val pair = (prev, s)
          prev = s
          pair
        }.filter(_._1 != null)
      }.toDF("a", "b")
    // boundary pairs: last suffix of partition p with the first of the
    // NEXT NON-EMPTY partition — lead() over the per-partition extremes
    val extremes = parts.groupBy($"_p").agg(
      min(struct($"rank", $"sfx")).as("f"), max(struct($"rank", $"sfx")).as("l"))
    val w = Window.orderBy($"_p") // bounded: one row per partition
    val bounds = extremes
      .withColumn("_nf", lead($"f", 1).over(w))
      .filter($"_nf".isNotNull)
      .select($"l.sfx".as("a"), $"_nf.sfx".as("b"))
    val pairs = inPart.unionByName(bounds)
    // capped LCP: prefix equality is monotone in the length, so the
    // count of prefix-equal lengths IS the LCP
    val lcp = expr(
      """size(filter(sequence(1, greatest(least(length(a), length(b)), 1)),
          i -> substring(a, 1, i) = substring(b, 1, i)))""")
    pairs.select($"a", lcp.as("l"))
      .filter($"l" >= 2)
      .select(expr("substring(a, 1, l)").as("span"),
        $"l".cast("long").as("lcp"))
      .groupBy($"span", $"lcp").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"lcp".desc, $"span").limit(k)
  }
}
