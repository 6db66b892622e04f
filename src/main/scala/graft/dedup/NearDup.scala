package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection beyond SimHash: exact, word n-gram Jaccard and
 * embedding-cosine variants — the training-data dedup suite. Every plan is
 * candidate-generation-by-key (hash bucket / shingle / LSH band), never
 * all-pairs, so each scales as a shuffle on the blocking key.
 */
object NearDup {

  /** Exact dedup: keep min id per content hash (hash-groupBy). */
  def exact(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n"))

  /** Word n-gram (shingle) Jaccard pairs >= threshold. Shingles above
   *  maxShingleDocFreq are dropped (stop-shingle removal — the standard
   *  guard against quadratic blowup on ubiquitous shingles). */
  def ngramJaccard(spark: SparkSession, docs: DataFrame, n: Int = 3,
                   threshold: Double = 0.8,
                   maxShingleDocFreq: Long = 1000): DataFrame = {
    import spark.implicits._
    val sh = docs.select(col("doc_id"),
        explode(shingleCol("text", n)).as("shingle"))
      .distinct()
    val rare = sh.groupBy($"shingle").agg(count(lit(1)).as("df"))
      .filter($"df" <= maxShingleDocFreq)
    val w = sh.join(rare.select("shingle"), Seq("shingle"), "left_semi")
      .persist()
    val sz = w.groupBy($"doc_id").agg(count(lit(1)).as("sz"))
    val inter = w.as("a").join(w.as("b"),
        $"a.shingle" === $"b.shingle" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("d1"), $"b.doc_id".as("d2"))
      .agg(count(lit(1)).as("i"))
    inter.join(sz.as("sa"), $"d1" === $"sa.doc_id")
      .join(sz.as("sb"), $"d2" === $"sb.doc_id")
      .select($"d1", $"d2",
        ($"i".cast("double") / ($"sa.sz" + $"sb.sz" - $"i")).as("jaccard"))
      .filter($"jaccard" >= threshold)
  }

  /** ARRAY<STRING> of word n-grams via SQL higher-order functions
   *  (codegen-friendly, no UDF). */
  def shingleCol(textCol: String, n: Int) =
    expr(s"""transform(
      sequence(0, greatest(size(split($textCol, ' ')) - $n, 0)),
      i -> array_join(slice(split($textCol, ' '), i + 1, $n), ' '))""")

  /** Bits for the SRP-LSH bucket space as a function of corpus size:
   *  buckets sized ~targetBucket vectors so the in-bucket exact pass
   *  stays bounded — at 10^9 vectors this yields ~24 bits, never the
   *  fixed-8 of the sf-scale demos (bits must scale with log n). */
  def autoBits(nVectors: Long, targetBucket: Int = 64): Int =
    math.max(8, math.ceil(math.log(math.max(1.0,
      nVectors.toDouble / targetBucket)) / math.log(2.0)).toInt)

  /** Embedding-cosine near-dup: sign-random-projection LSH bucket join,
   *  exact cosine inside buckets only. Pass bits = autoBits(n) at scale.
   *  Buckets are CAPPED at `maxBucket` members (vec_id order) before the
   *  self-join — mirroring Linker.MaxBlock / SimHash.MaxBand — so a
   *  degenerate bucket (e.g. the all-zeros bucket of zero/constant vectors)
   *  is a bounded task, never an unbounded quadratic join. Default is far
   *  above autoBits' target bucket size (64), so the cap only engages on
   *  pathological skew. */
  def embeddingCosine(spark: SparkSession, emb: DataFrame,
                      threshold: Double = 0.95, bits: Int = 12,
                      maxBucket: Int = 4096): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val bucketBits = (0 until bits).map { j =>
      val proj = expr(
        s"""aggregate(zip_with(embedding, sequence(0, size(embedding)-1),
            (x, i) -> CAST(x AS DOUBLE) * (CAST((i * 31 + $j * 17) % 7 AS DOUBLE) - 3.0)),
            CAST(0 AS DOUBLE), (acc, v) -> acc + v)""")
      when(proj >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
    val w = Window.partitionBy($"bucket").orderBy($"vec_id")
    val b = emb.withColumn("bucket", bucketBits)
      .withColumn("_rn", row_number().over(w))
      .filter($"_rn" <= maxBucket).drop("_rn")
      .persist()
    val dot = expr("aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    def norm(side: String) = expr(
      s"sqrt(aggregate($side.embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))")
    b.as("a").join(b.as("b"),
        $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("v1"), $"b.vec_id".as("v2"),
        (dot / (norm("a") * norm("b"))).as("cos"))
      .filter($"cos" >= threshold)
  }
}
