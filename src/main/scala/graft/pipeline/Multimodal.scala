package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is a clearly-marked STUB (no image/audio libraries exist
  * in this container): `decodeStub` produces deterministic fake features
  * from the bytes. Everything around it — schema, batching, partitioning,
  * null handling — is the real Spark plumbing a codec-backed UDF would use,
  * so swapping in a real decoder is a one-function change.
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
      byte_len: Long, content_hash: Long, features: Array[Float])

  /** STUB decode: a real implementation would decode/resample here
    * (e.g. JPEG -> pixels -> resize -> embed). Deterministic fake:
    * 16 features derived from a rolling hash of the bytes. */
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
    * the Scala analog of mapInPandas batch processing) — one decoder
    * instantiation per partition, not per row. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.select("media_id", "kind", "bytes").mapPartitions { it =>
      // per-partition decoder setup would go here (real codecs are costly
      // to init; amortize across the batch)
      it.map { r =>
        val id = r.getLong(0)
        val kind = r.getString(1)
        val bytes = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
        val feats = decodeStub(bytes)
        val hash = if (bytes == null) 0L
          else com.google.common.hash.Hashing.murmur3_128().hashBytes(bytes).asLong()
        MediaFeatures(id, kind, bytes != null && bytes.nonEmpty,
          if (bytes == null) 0L else bytes.length.toLong, hash, feats)
      }
    }
  }

  final case class ResizedImage(media_id: Long, width: Int, height: Int,
                                target_w: Int, target_h: Int, thumb_hash: Long)

  /** STUB resize: a real implementation would decode + bilinear-resample.
    * The plumbing (metadata-driven target size, batch iteration, null
    * safety) is real; the pixel op is a deterministic hash of
    * (bytes, target box). */
  def resizeImages(spark: SparkSession, media: DataFrame,
                   maxDim: Int = 256): Dataset[ResizedImage] = {
    implicit val enc = Encoders.product[ResizedImage]
    media.filter(org.apache.spark.sql.functions.col("kind") === "image")
      .select("media_id", "meta_width", "meta_height", "bytes")
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val w = if (r.isNullAt(1)) maxDim else r.getInt(1)
          val h = if (r.isNullAt(2)) maxDim else r.getInt(2)
          val scale = math.min(1.0, maxDim.toDouble / math.max(w, h))
          val (tw, th) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          val bytes = if (r.isNullAt(3)) Array.empty[Byte] else r.getAs[Array[Byte]](3)
          val hash = com.google.common.hash.Hashing.murmur3_128()
            .newHasher().putBytes(bytes).putInt(tw).putInt(th).hash().asLong()
          ResizedImage(id, w, h, tw, th, hash)
        }
      }
  }

  final case class FrameSample(media_id: Long, frame_ts_ms: Long, frame_hash: Long)

  /** STUB frame sampling: emits `fps`-spaced frame timestamps across the
    * clip duration with a deterministic per-frame content hash (a real
    * impl would seek+decode). One row per sampled frame (flatMap shape —
    * the UDTF analog). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   everyMs: Long = 5000L, maxFrames: Int = 16): Dataset[FrameSample] = {
    implicit val enc = Encoders.product[FrameSample]
    media.filter(org.apache.spark.sql.functions.col("kind") === "video")
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

  /** Deterministic synthetic media table for tests/bench (binary payloads
    * derived from the row index — no external data). */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = spark.range(0, n, 1, partitions).as[Long].map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val len = 64 + (i % 512).toInt
      val bytes = Array.tabulate[Byte](len)(k => ((i * 31 + k * 7) & 0xff).toByte)
      (i, kind, if (kind == "image") "image/png" else if (kind == "audio") "audio/ogg" else "video/webm",
        bytes, if (kind == "image") Some(64 + (i % 1024).toInt) else None,
        if (kind == "image") Some(64 + (i % 768).toInt) else None,
        if (kind != "image") Some(1000L + i % 60000) else None)
    }.toDF("media_id", "kind", "mime", "bytes", "meta_width", "meta_height", "meta_duration_ms")
    rows
  }
}
