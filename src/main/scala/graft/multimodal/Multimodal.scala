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

  // ---------------------------------------------------------------------
  // Audio: REAL decode via javax.sound.sampled (pure JDK — WAV/AIFF/AU PCM
  // need no external codec). Compressed codecs (mp3/aac) are absent from
  // the JDK, so those payloads take the same byte-histogram fallback the
  // schema already declares.
  // ---------------------------------------------------------------------

  /** decoded=false rows carry -1 sentinels; amp_rms is the root-mean-square
   *  16-bit sample amplitude of the (possibly strided) probe. */
  final case class AudioFeatures(media_id: Long, mime: String, n_bytes: Int,
                                 decoded: Boolean, sample_rate: Int,
                                 channels: Int, frames: Long,
                                 duration_ms: Long, amp_rms: Double)

  /** Real audio decode: container/encoding via AudioSystem, PCM samples
   *  streamed (converted to 16-bit signed PCM when the source encoding
   *  differs). Frame probes are STRIDED to a bounded count (<= 65536) so a
   *  10-hour payload costs the same as a jingle — the image decoder's
   *  subsampling rule applied to the time axis. None when no JDK reader
   *  accepts the bytes. */
  def decodeAudio(media: Array[Byte]): Option[(Int, Int, Long, Double)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(media))
      val f = in.getFormat
      val frames = in.getFrameLength
      if (frames <= 0 || f.getSampleRate <= 0) return None
      val pcm = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        f.getSampleRate, 16, f.getChannels, 2 * f.getChannels,
        f.getSampleRate, false)
      val s = if (f.matches(pcm)) in
              else AudioSystem.getAudioInputStream(pcm, in)
      val frameBytes = 2 * f.getChannels
      val stride = math.max(1L, frames / 65536L)
      var sumSq = 0.0
      var n = 0L
      var idx = 0L
      val buf = new Array[Byte](frameBytes * 1024)
      var carry = 0 // bytes of a split frame carried between reads
      var eof = false
      while (!eof) {
        val r = s.read(buf, carry, buf.length - carry)
        if (r <= 0) eof = true
        else {
          val avail = carry + r
          val fullFrames = avail / frameBytes
          var i = 0
          while (i < fullFrames) {
            if (idx % stride == 0L) {
              // probe channel 0 of this frame (little-endian 16-bit)
              val o = i * frameBytes
              val v = ((buf(o + 1) << 8) | (buf(o) & 0xFF)).toShort.toDouble
              sumSq += v * v
              n += 1
            }
            idx += 1
            i += 1
          }
          val used = fullFrames * frameBytes
          carry = avail - used
          if (carry > 0) System.arraycopy(buf, used, buf, 0, carry)
        }
      }
      s.close()
      if (n == 0) None
      else Some((f.getSampleRate.toInt, f.getChannels, frames,
        math.sqrt(sumSq / n)))
    } catch { case _: Exception => None }
  }

  def extractAudioOne(r: MediaRow): AudioFeatures = decodeAudio(r.media) match {
    case Some((rate, ch, frames, rms)) =>
      AudioFeatures(r.media_id, r.mime, r.n_bytes, decoded = true, rate, ch,
        frames, frames * 1000L / rate, rms)
    case None =>
      AudioFeatures(r.media_id, r.mime, r.n_bytes, decoded = false,
        -1, -1, -1L, -1L, -1.0)
  }

  /** Batched audio feature extraction (same per-partition shape as
   *  extractFeatures). */
  def extractAudio(spark: SparkSession,
                   media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[AudioFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(extractAudioOne))
  }

  /** Deterministic constant-amplitude mono 16-bit PCM WAV (hand-rolled
   *  RIFF container — no encoder variance). Every sample is the same value
   *  v(id), so the decoded RMS is EXACTLY v (n·v² sums, divides and roots
   *  exactly in doubles for v < 2^16), the frame count is exact, and
   *  duration_ms divides exactly (frames are multiples of 8 at 8 kHz) —
   *  all arithmetic a SQL oracle recomputes from the id. */
  def syntheticWav(id: Long): Array[Byte] = {
    val rate = 8000
    val frames = 400 + (id % 5).toInt * 80
    val v = (1000 + (id * 131) % 15000).toShort
    val dataLen = frames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(rate)
      .putInt(rate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < frames) { bb.putShort(v); i += 1 }
    bb.array()
  }

  /** Driver query: every 3rd payload is a generated WAV that
   *  javax.sound.sampled REALLY decodes (rate/frames/duration/RMS are
   *  id-arithmetic the oracle recomputes); the rest are md5 bytes hitting
   *  the undecodable fallback. amp_rms is emitted as BIGINT — exact for
   *  the constant-amplitude fixture (see syntheticWav). */
  def audioQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r6: Par.spread was measured here and REVERTED — the JDK codec
    // entry points these queries deliberately exercise (AudioSystem /
    // ImageIO service lookup) synchronize on process-global registries,
    // so 32 concurrent decode tasks queue on the lock instead of
    // running: q36 0.47 -> 1.76 s, stage metrics 42.5 task-s wall vs
    // 1.9 task-s CPU. Single-task decode is the fastest shape the
    // declared JDK-codec fallback admits; at scale the fix is a
    // lock-free codec library, not partitioning.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, text) =>
        if (id % 3 == 0) {
          val wav = syntheticWav(id)
          MediaRow(id, wav, "audio/wav", wav.length)
        } else {
          val b = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes("UTF-8"))
          MediaRow(id, b, "application/octet-stream", b.length)
        }
      }
    extractAudio(spark, media).toDF()
      .select(col("media_id"), col("mime"), col("decoded"),
        col("sample_rate"), col("channels"), col("frames"),
        col("duration_ms"), col("amp_rms").cast("bigint").as("amp_rms"))
      .orderBy("media_id")
  }

  // ---------------------------------------------------------------------
  // Video: no codec ships with the JDK, so the DECODE is a declared
  // deterministic raw container ("RVID": magic + big-endian u16 w, h,
  // nFrames + nFrames raw w*h*3 RGB frames) — but the Spark-side plumbing
  // (schema, partition batching, bounded FRAME SAMPLING, per-frame channel
  // stats) is the real thing a JNI/ffmpeg decoder would slot into.
  // ---------------------------------------------------------------------

  final case class VideoFeatures(media_id: Long, mime: String,
                                 decoded: Boolean, width: Int, height: Int,
                                 n_frames: Int, n_sampled: Int,
                                 first_r: Int, first_g: Int, first_b: Int,
                                 last_r: Int, last_g: Int, last_b: Int)

  /** Frames probed per video (evenly spaced across the time axis — a
   *  2-hour payload costs the same as a clip). */
  val MaxSampledFrames = 4

  /** Evenly spaced sample indices over [0, nFrames): always includes the
   *  first and last frame; at most MaxSampledFrames probes. */
  def sampleIndices(nFrames: Int): Array[Int] = {
    val k = math.min(MaxSampledFrames, nFrames)
    if (k <= 1) Array(0)
    else Array.tabulate(k)(j => (j.toLong * (nFrames - 1) / (k - 1)).toInt)
  }

  /** Parse + frame-sample an RVID payload: header-validated, then only the
   *  sampled frames' pixels are touched (seek-by-offset, the access shape
   *  a real demuxer gives). Returns (w, h, nFrames, per-sampled-frame RGB
   *  means). None on bad magic / truncated payload. */
  def decodeRawVideo(media: Array[Byte])
      : Option[(Int, Int, Int, Array[Array[Double]])] = {
    if (media.length < 10 || media(0) != 'R' || media(1) != 'V' ||
        media(2) != 'I' || media(3) != 'D') return None
    def u16(o: Int): Int = ((media(o) & 0xFF) << 8) | (media(o + 1) & 0xFF)
    val w = u16(4); val h = u16(6); val n = u16(8)
    val frameLen = w * h * 3
    if (w <= 0 || h <= 0 || n <= 0 ||
        media.length != 10 + frameLen.toLong * n) return None
    val means = sampleIndices(n).map { f =>
      val base = 10 + f * frameLen
      var r = 0L; var g = 0L; var b = 0L
      var i = 0
      while (i < frameLen) {
        r += media(base + i) & 0xFF
        g += media(base + i + 1) & 0xFF
        b += media(base + i + 2) & 0xFF
        i += 3
      }
      val px = (w * h).toDouble
      Array(r / px, g / px, b / px)
    }
    Some((w, h, n, means))
  }

  def extractVideoOne(r: MediaRow): VideoFeatures = decodeRawVideo(r.media) match {
    case Some((w, h, n, means)) =>
      val first = means.head; val last = means.last
      VideoFeatures(r.media_id, r.mime, decoded = true, w, h, n, means.length,
        first(0).round.toInt, first(1).round.toInt, first(2).round.toInt,
        last(0).round.toInt, last(1).round.toInt, last(2).round.toInt)
    case None =>
      VideoFeatures(r.media_id, r.mime, decoded = false, -1, -1, -1, 0,
        -1, -1, -1, -1, -1, -1)
  }

  def extractVideo(spark: SparkSession,
                   media: org.apache.spark.sql.Dataset[MediaRow])
      : org.apache.spark.sql.Dataset[VideoFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(extractVideoOne))
  }

  /** Deterministic RVID payload: solid-color frames whose per-frame color
   *  is id+frame arithmetic — so the first/last sampled frame means are
   *  exact integers a SQL oracle recomputes. */
  def syntheticRawVideo(id: Long): Array[Byte] = {
    val w = 4 + (id % 5).toInt
    val h = 4 + (id % 3).toInt
    // modulus co-prime to the query's id%4==1 assignment, so clip lengths
    // (and hence sampled-frame counts) actually vary across the fixture
    val n = 2 + ((id % 7) % 4).toInt
    val out = new Array[Byte](10 + w * h * 3 * n)
    out(0) = 'R'; out(1) = 'V'; out(2) = 'I'; out(3) = 'D'
    def putU16(o: Int, v: Int): Unit = {
      out(o) = ((v >> 8) & 0xFF).toByte; out(o + 1) = (v & 0xFF).toByte
    }
    putU16(4, w); putU16(6, h); putU16(8, n)
    var f = 0
    while (f < n) {
      val r = ((id * 11 + f * 7) % 256).toByte
      val g = ((id * 13 + f * 17) % 256).toByte
      val b = ((id * 17 + f * 29) % 256).toByte
      val base = 10 + f * w * h * 3
      var i = 0
      while (i < w * h * 3) {
        out(base + i) = r; out(base + i + 1) = g; out(base + i + 2) = b
        i += 3
      }
      f += 1
    }
    out
  }

  /** Driver query: every 4th-minus-1 payload is an RVID clip the frame
   *  sampler really demuxes (dimensions, frame counts and the first/last
   *  sampled frame's exact solid-color means are id-arithmetic); the rest
   *  are md5 bytes hitting the bad-magic fallback. */
  def videoQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r6: Par.spread was measured here and REVERTED — the JDK codec
    // entry points these queries deliberately exercise (AudioSystem /
    // ImageIO service lookup) synchronize on process-global registries,
    // so 32 concurrent decode tasks queue on the lock instead of
    // running: q36 0.47 -> 1.76 s, stage metrics 42.5 task-s wall vs
    // 1.9 task-s CPU. Single-task decode is the fastest shape the
    // declared JDK-codec fallback admits; at scale the fix is a
    // lock-free codec library, not partitioning.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val media = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].map { case (id, text) =>
        if (id % 4 == 1) {
          val v = syntheticRawVideo(id)
          MediaRow(id, v, "video/x-rvid", v.length)
        } else {
          val b = java.security.MessageDigest.getInstance("MD5")
            .digest(text.getBytes("UTF-8"))
          MediaRow(id, b, "application/octet-stream", b.length)
        }
      }
    extractVideo(spark, media).toDF()
      .select(col("media_id"), col("mime"), col("decoded"), col("width"),
        col("height"), col("n_frames"), col("n_sampled"),
        col("first_r"), col("first_g"), col("first_b"),
        col("last_r"), col("last_g"), col("last_b"))
      .orderBy("media_id")
  }

  /** Query for the driver harness, exercising BOTH payload paths: every
   *  5th media_id carries a real (deterministically generated) PNG that
   *  decodeImage must actually decode — dimensions and solid-color channel
   *  means are exact functions of the id, so the whole output has a full
   *  DuckDB oracle; the rest carry md5 bytes (not a decodable image),
   *  exercising the byte-histogram fallback with decoded=false. */
  def featureQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // r6: Par.spread was measured here and REVERTED — the JDK codec
    // entry points these queries deliberately exercise (AudioSystem /
    // ImageIO service lookup) synchronize on process-global registries,
    // so 32 concurrent decode tasks queue on the lock instead of
    // running: q36 0.47 -> 1.76 s, stage metrics 42.5 task-s wall vs
    // 1.9 task-s CPU. Single-task decode is the fastest shape the
    // declared JDK-codec fallback admits; at scale the fix is a
    // lock-free codec library, not partitioning.
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
