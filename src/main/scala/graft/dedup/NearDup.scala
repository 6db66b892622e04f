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

  /** IVF (inverted-file) ANN — the coarse-quantizer scale path beside the
   *  SRP-LSH one: a k-means quantizer partitions the corpus into nLists
   *  inverted lists; a query exactly scans only its nProbe nearest lists,
   *  so the scanned fraction is ~nProbe/nLists regardless of corpus size.
   *  Spark shape: ml.KMeans (k-means||, distributed, seeded) fits the
   *  quantizer; list assignment is a model transform (codegen'd predict);
   *  the probe is a partition-pruned filter + exact cosine + top-k — the
   *  centroid table is tiny and driver-resident, the corpus never leaves
   *  the cluster. At 100 TB the assigned table would be WRITTEN
   *  partitioned by list_id so a probe reads only nProbe partitions. */
  def ivfTopK(spark: SparkSession, emb: DataFrame, query: Array[Float],
              k: Int = 10, nLists: Int = 16, nProbe: Int = 2,
              seed: Long = 7L): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vecs = emb.withColumn("fv",
      array_to_vector(expr("transform(embedding, x -> CAST(x AS DOUBLE))")))
    val km = new KMeans().setK(nLists).setSeed(seed).setFeaturesCol("fv")
      .setPredictionCol("list_id")
    val model = km.fit(vecs)
    // nProbe nearest centroids to the query — driver-side over the tiny
    // centroid table (nLists entries)
    val q = query.map(_.toDouble)
    def dist2(c: org.apache.spark.ml.linalg.Vector): Double = {
      var s = 0.0; var i = 0
      while (i < q.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    val probed = model.clusterCenters.zipWithIndex
      .sortBy { case (c, i) => (dist2(c), i) }.take(nProbe).map(_._2).toSeq
    val qLit = typedLit(query.toSeq)
    val dot = expr("aggregate(zip_with(embedding, qe, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)")
    val na = expr("aggregate(embedding, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    val nb = expr("aggregate(qe, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE))")
    model.transform(vecs)
      .filter($"list_id".isin(probed: _*)) // the partition-pruning predicate
      .withColumn("qe", qLit)
      .select($"vec_id", $"list_id",
        round(dot / sqrt(na * nb), 5).as("cos"))
      .orderBy($"cos".desc, $"vec_id").limit(k)
  }

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
