package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * IMAGES are decoded for real: `javax.imageio` ships with the JDK, so
  * PNG/JPEG decode, true dimensions, grid features and bilinear resize all
  * run on actual pixels. AUDIO/VIDEO decode remains a clearly-marked STUB
  * (no codec libraries exist in this container): deterministic fake
  * features from the bytes. The Spark plumbing — schema, batching,
  * partitioning, null handling — is identical for both, so swapping a real
  * audio/video codec in is a one-function change.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),     // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta_width", IntegerType, nullable = true),
    StructField("meta_height", IntegerType, nullable = true),
    StructField("meta_duration_ms", LongType, nullable = true)))

  final case class MediaFeatures(
      media_id: Long, kind: String, ok: Boolean,
      byte_len: Long, content_hash: Long, width: Int, height: Int,
      features: Array[Float])

  /** Real image decode (JDK ImageIO): PNG/JPEG/GIF/BMP in, BufferedImage
    * out; None for undecodable bytes. */
  def decodeImage(bytes: Array[Byte]): Option[BufferedImage] =
    if (bytes == null || bytes.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

  /** 16 real features from decoded pixels: mean luminance over a 4x4 grid
    * (a fixed-size content descriptor independent of image dimensions). */
  def gridLuminance(img: BufferedImage): Array[Float] = {
    val out = new Array[Float](16)
    val w = img.getWidth
    val h = img.getHeight
    var gy = 0
    while (gy < 4) {
      var gx = 0
      while (gx < 4) {
        val x0 = gx * w / 4; val x1 = math.max(x0 + 1, (gx + 1) * w / 4)
        val y0 = gy * h / 4; val y1 = math.max(y0 + 1, (gy + 1) * h / 4)
        var sum = 0.0
        var n = 0
        var y = y0
        while (y < y1 && y < h) {
          var x = x0
          while (x < x1 && x < w) {
            val rgb = img.getRGB(x, y)
            sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * 4 + gx) = if (n == 0) 0.0f else (sum / (255.0 * n)).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** STUB decode for audio/video: a real implementation would decode /
    * resample here. Deterministic fake: 16 features from a rolling hash. */
  private def decodeStub(bytes: Array[Byte]): Array[Float] = {
    if (bytes == null || bytes.isEmpty) return Array.fill(16)(0.0f)
    val out = new Array[Float](16)
    var h = 1469598103934665603L
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      out(i & 15) = java.lang.Float.intBitsToFloat(0x3f000000 | (((h >>> 40).toInt) & 0x007fffff))
      i += 1
    }
    out
  }

  /** Feature extraction over a media table: mapPartitions (batch-at-a-time,
    * the Scala analog of mapInPandas batch processing) — decoder state is
    * amortized across the batch, not re-created per row. Images decode for
    * real; audio/video use the labeled stub. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val hash = if (bytes == null) 0L
          else com.google.common.hash.Hashing.murmur3_128().hashBytes(bytes).asLong()
        val len = if (bytes == null) 0L else bytes.length.toLong
        if (kind == "image") {
          decodeImage(bytes) match {
            case Some(img) =>
              MediaFeatures(id, kind, ok = true, len, hash,
                img.getWidth, img.getHeight, gridLuminance(img))
            case None =>
              MediaFeatures(id, kind, ok = false, len, hash, 0, 0, Array.fill(16)(0.0f))
          }
        } else {
          // STUB path: audio/video codecs are not in this container
          MediaFeatures(id, kind, bytes != null && bytes.nonEmpty, len, hash,
            0, 0, decodeStub(bytes))
        }
      }
    }
  }

  final case class ResizedImage(media_id: Long, width: Int, height: Int,
                                target_w: Int, target_h: Int, thumb_hash: Long)

  /** Real resize: ImageIO decode + bilinear Graphics2D resample into the
    * `maxDim` bounding box; `thumb_hash` is a content hash of the resampled
    * ARGB pixels. Undecodable rows are dropped (counted by `ok=false` in
    * [[extractFeatures]], the screening pass). */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   maxDim: Int = 256): Dataset[ResizedImage] = {
    implicit val enc = Encoders.product[ResizedImage]
    media.filter(col("kind") === "image")
      .select("media_id", "bytes")
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          decodeImage(bytes).map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
            val tw = math.max(1, (w * scale).toInt)
            val th = math.max(1, (h * scale).toInt)
            val thumb = new BufferedImage(tw, th, BufferedImage.TYPE_INT_ARGB)
            val g = thumb.createGraphics()
            g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
              RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, tw, th, null)
            g.dispose()
            val px = thumb.getRGB(0, 0, tw, th, null, 0, tw)
            val hasher = com.google.common.hash.Hashing.murmur3_128().newHasher()
            var i = 0
            while (i < px.length) { hasher.putInt(px(i)); i += 1 }
            ResizedImage(id, w, h, tw, th, hasher.hash().asLong())
          }
        }
      }
  }

  final case class FrameSample(media_id: Long, frame_ts_ms: Long, frame_hash: Long)

  /** STUB frame sampling: emits `everyMs`-spaced frame timestamps across the
    * clip duration with a deterministic per-frame content hash (a real
    * impl would seek+decode — no video codecs in this container). One row
    * per sampled frame (flatMap shape — the UDTF analog). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   everyMs: Long = 5000L, maxFrames: Int = 16): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.filter(col("kind") === "video")
      .select("media_id", "meta_duration_ms", "bytes")
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val dur = if (r.isNullAt(1)) 0L else r.getLong(1)
          val bytes = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val n = math.min(maxFrames.toLong, if (everyMs <= 0) 0L else dur / everyMs + 1)
          (0L until n).map { k =>
            val ts = k * everyMs
            val hash = com.google.common.hash.Hashing.murmur3_128()
              .newHasher().putBytes(bytes).putLong(ts).hash().asLong()
            FrameSample(id, ts, hash)
          }
        }
      }
  }

  /** A real, deterministic tiny PNG: seeded pixel pattern encoded through
    * ImageIO (exercises the true decode path end-to-end). */
  def syntheticPng(i: Long): (Array[Byte], Int, Int) = {
    val w = 8 + (i % 16).toInt
    val h = 8 + (i % 12).toInt
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (i * 2654435761L + x * 31 + y * 131) & 0xffffffL
        img.setRGB(x, y, v.toInt)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    (bos.toByteArray, w, h)
  }

  /** Deterministic synthetic media table for tests/bench: image rows carry
    * REAL PNG payloads (decoded by the real path above); audio/video rows
    * carry opaque seeded bytes for the stub path. No external data. */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = spark.range(0, n, 1, partitions).as[Long].map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      if (kind == "image") {
        val (png, w, h) = syntheticPng(i)
        (i, kind, "image/png", png, Some(w), Some(h), None: Option[Long])
      } else {
        val len = 64 + (i % 512).toInt
        val bytes = Array.tabulate[Byte](len)(k => ((i * 31 + k * 7) & 0xff).toByte)
        (i, kind, if (kind == "audio") "audio/ogg" else "video/webm",
          bytes, None: Option[Int], None: Option[Int], Some(1000L + i % 60000))
      }
    }.toDF("media_id", "kind", "mime", "bytes", "meta_width", "meta_height", "meta_duration_ms")
    rows
  }
}
