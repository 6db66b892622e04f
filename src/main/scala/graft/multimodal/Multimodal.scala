package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: opaque BINARY media + typed metadata, with a
 * batched per-partition decode/feature-extract stage.
 *
 * The decode step is REAL for images: `javax.imageio` ships with the JDK,
 * so PNG/JPEG/GIF/BMP payloads decode to (width, height, per-channel
 * means) with zero extra dependencies. Payloads no JDK reader understands
 * (audio/video/truncated bytes) fall back to a deterministic 16-bin byte
 * histogram, flagged `decoded = false` — the schema, partition batching
 * and feature shape are identical either way, so swapping in a JNI/ONNX
 * decoder for the non-image modalities changes nothing downstream. (The
 * PySpark equivalent would be a Pandas UDF over mapInPandas; in Scala the
 * idiomatic batched form is mapPartitions over the typed Dataset.)
 */
object Multimodal {

  final case class MediaRow(media_id: Long, media: Array[Byte],
                            mime: String, n_bytes: Int)
  /** width/height are -1 when the payload wasn't a decodable image;
   *  features = [meanR, meanG, meanB] ++ 16-bin byte histogram (19 dims,
   *  channel means zero when undecoded). */
  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
                                 decoded: Boolean, width: Int, height: Int,
                                 features: Array[Float])

  // ImageIO's default scratch-file cache would turn every decode into
  // executor-local disk I/O; decode purely in memory
  private lazy val imageIoInit: Unit = javax.imageio.ImageIO.setUseCache(false)

  /** Real image decode: dimensions + per-channel RGB means. Pixels are
   *  SUBSAMPLED on a bounded grid (<= 64x64 probes) so a 100-megapixel
   *  payload costs the same as a thumbnail — feature quality, not fidelity,
   *  is the point at corpus scale. None when no JDK reader accepts the
   *  bytes. */
  def decodeImage(media: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    imageIoInit
    try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(media))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) None
        else {
          val stepX = math.max(1, w / 64)
          val stepY = math.max(1, h / 64)
          var r = 0L; var g = 0L; var b = 0L; var n = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; b += p & 0xFF
              n += 1
              x += stepX
            }
            y += stepY
          }
          Some((w, h, Array((r.toDouble / n).toFloat,
            (g.toDouble / n).toFloat, (b.toDouble / n).toFloat)))
        }
      }
    } catch { case _: Exception => None }
  }

  /** Fallback features: byte histogram over 16 buckets, L1-normalized.
   *  Deterministic function of the payload bytes only. */
  def byteHistogram(media: Array[Byte]): Array[Float] = {
    val hist = new Array[Float](16)
    var i = 0
    while (i < media.length) { hist((media(i) & 0xFF) / 16) += 1f; i += 1 }
    val n = math.max(1, media.length).toFloat
    var j = 0
    while (j < 16) { hist(j) /= n; j += 1 }
    hist
  }

  def extractOne(r: MediaRow): MediaFeatures = decodeImage(r.media) match {
    case Some((w, h, means)) =>
      MediaFeatures(r.media_id, r.mime, r.n_bytes, decoded = true, w, h,
        means ++ byteHistogram(r.media))
    case None =>
      MediaFeatures(r.media_id, r.mime, r.n_bytes, decoded = false, -1, -1,
        Array(0f, 0f, 0f) ++ byteHistogram(r.media))
  }

  /** Batched feature extraction: one decoder context per partition (the
   *  shape a real codec needs), rows streamed through it. */
  def extractFeatures(spark: SparkSession,
                      media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point: ImageIO cache off once per JVM; a heavier
      // codec/model would initialize here
      imageIoInit
      it.map(extractOne)
    }
  }

  /** Deterministic tiny solid-color PNG — a pure function of the id, so
   *  the DECODED properties (dimensions + exact channel means, PNG being
   *  lossless) are arithmetic functions of the id that a SQL oracle can
   *  recompute without an image library. */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = 8 + (id % 9).toInt
    val h = 8 + (id % 7).toInt
    val rgb = (((id * 37) % 256).toInt << 16) |
      (((id * 59) % 256).toInt << 8) | ((id * 83) % 256).toInt
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    imageIoInit
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Query for the driver harness, exercising BOTH payload paths: every
   *  5th media_id carries a real (deterministically generated) PNG that
   *  decodeImage must actually decode — dimensions and solid-color channel
   *  means are exact functions of the id, so the whole output has a full
   *  DuckDB oracle; the rest carry md5 bytes (not a decodable image),
   *  exercising the byte-histogram fallback with decoded=false. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, text) =>
        if (id % 5 == 0) {
          val png = syntheticPng(id)
          MediaRow(id, png, "image/png", png.length)
        } else {
          val b = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes("UTF-8"))
          MediaRow(id, b, "application/octet-stream", b.length)
        }
      }
    extractFeatures(spark, media).toDF()
      .select(col("media_id"), col("mime"), col("decoded"),
        col("width"), col("height"),
        element_at(col("features"), 1).cast("int").as("mean_r"),
        element_at(col("features"), 2).cast("int").as("mean_g"),
        element_at(col("features"), 3).cast("int").as("mean_b"))
      .orderBy("media_id")
  }
}
