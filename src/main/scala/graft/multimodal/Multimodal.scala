package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: opaque BINARY media + typed metadata, with a
 * batched per-partition decode/feature-extract stage.
 *
 * The decode step is a clearly-marked deterministic STUB (no image/audio
 * libs in this container): it derives a 16-dim byte-histogram "feature
 * vector" from the binary payload. The Spark-side plumbing — schema,
 * partition batching, feature shape — is real: swap `decodeStub` for a
 * JNI/ONNX decoder on a real cluster and nothing else changes. (The PySpark
 * equivalent would be a Pandas UDF over mapInPandas; in Scala the idiomatic
 * batched form is mapPartitions over the typed Dataset.)
 */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte],
                            mime: String, n_bytes: Int)
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
                                 features: Array[Float])

  /** STUB decoder: byte histogram over 16 buckets, L1-normalized.
   *  Deterministic function of the payload bytes only. */
  def decodeStub(media: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xFF) / 16) += 1f; i += 1 }
    val n = math.max(1, media.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  /** Batched feature extraction: one decoder context per partition (the
   *  shape a real codec needs), rows streamed through it. */
  def extractFeatures(spark: SparkSession,
                      media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // real impl: initialize decoder/model once per partition here
      it.map(r => MediaFeatures(r.media_id, r.mime, r.n_bytes,
        decodeStub(r.media)))
    }
  }

  /** Query for the driver harness: synthesize a binary column from the
   *  documents table (md5 bytes as a stand-in payload), run the batched
   *  extract, return features. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = docs.select(
      col("doc_id").as("media_id"),
      unhex(md5(col("text"))).as("media"),
      lit("application/octet-stream").as("mime"),
      lit(16).as("n_bytes")).as[MediaRow]
    extractFeatures(spark, media).toDF()
      .select(col("media_id"), col("n_bytes"),
        round(element_at(col("features"), 1), 5).as("f0"))
      .orderBy("media_id")
  }
}
