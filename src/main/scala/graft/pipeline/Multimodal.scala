package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * IMAGES and AUDIO are decoded for real: `javax.imageio` (PNG/JPEG/GIF/
  * BMP) and `javax.sound.sampled` (WAV/AIFF/AU PCM) both ship with the
  * JDK, so image dimensions/grid features/resize and audio sample rate/
  * duration/windowed-RMS features all come from actual pixels and
  * samples. VIDEO decode remains a clearly-marked STUB (no video codec
  * exists in this container): deterministic fake features from the bytes.
  * The Spark plumbing — schema, batching, partitioning, null handling —
  * is identical for all three, so swapping a real video codec in is a
  * one-function change.
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
      sample_rate: Int, duration_ms: Long,
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

  final case class AudioInfo(sampleRate: Int, channels: Int,
                             durationMs: Long, features: Array[Float])

  /** Real audio decode (JDK javax.sound.sampled): WAV/AIFF/AU PCM in,
    * true sample rate / channel count / duration plus 16 real features —
    * RMS amplitude over 16 equal time windows of the mono mix (the audio
    * analog of [[gridLuminance]]: a fixed-size content descriptor
    * independent of clip length). None for undecodable bytes.
    *
    * Memory: the decoded PCM is processed as a STREAM in 64 KiB chunks —
    * never materialized whole (VERDICT r3 #4: `readAllBytes()` put a
    * 2-hour 44.1 kHz stereo clip ~1.2 GB on-heap PER ROW). `maxBytes`
    * bounds total decoded bytes examined: features beyond the cap come
    * from the sub-cap prefix (duration stays true — from the declared
    * frame count). A TRUNCATED container (header promises more frames
    * than the payload delivers — a partial crawl download) is detected
    * when the stream ends early and re-decoded against the ACTUAL frame
    * count, so windows stay exact over the real audio and duration
    * reports delivered — not phantom — frames (pre-r4 behavior). Streams
    * that declare no frame length fall back to a capped buffered read. */
  def decodeAudio(bytes: Array[Byte], maxBytes: Long = 256L << 20): Option[AudioInfo] =
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val pcm = openPcm(bytes)
        val f = pcm.getFormat
        val ch = f.getChannels
        val frameSize = f.getFrameSize // = 2 * channels for 16-bit
        if (frameSize <= 0)
          return Some(AudioInfo(f.getSampleRate.toInt, ch, 0L, new Array[Float](16)))
        val declared = pcm.getFrameLength // container frame count; may be -1
        val capFrames = math.max(1L, maxBytes / frameSize)
        if (declared < 0) {
          // no declared length: capped buffered read (rare path), then
          // frame count from what arrived
          val data = pcm.readNBytes(math.min(maxBytes, (Int.MaxValue - 8).toLong).toInt)
          val n = data.length / frameSize
          if (n == 0)
            return Some(AudioInfo(f.getSampleRate.toInt, ch, 0L, new Array[Float](16)))
          return Some(rmsWindows(data, n, n, f))
        }
        // window geometry needs the processed frame count up front
        val nFrames = math.min(declared, capFrames)
        if (nFrames == 0)
          return Some(AudioInfo(f.getSampleRate.toInt, ch, 0L, new Array[Float](16)))
        val (feats, framesRead) = streamWindows(pcm, nFrames, f)
        if (framesRead < nFrames) {
          // truncated payload: geometry was wrong (trailing windows empty,
          // real audio squeezed into the early ones) — one extra decode
          // against the ACTUAL count, only for corrupt inputs
          if (framesRead == 0)
            return Some(AudioInfo(f.getSampleRate.toInt, ch, 0L, new Array[Float](16)))
          val (feats2, _) = streamWindows(openPcm(bytes), framesRead, f)
          val durMs = math.round(framesRead * 1000.0 / f.getSampleRate)
          return Some(AudioInfo(f.getSampleRate.toInt, ch, durMs, feats2))
        }
        val durMs = math.round(declared * 1000.0 / f.getSampleRate)
        Some(AudioInfo(f.getSampleRate.toInt, ch, durMs, feats))
      } catch { case _: Exception => None }

  /** Open bytes as a 16-bit signed PCM stream (one shape for the loop). */
  private def openPcm(bytes: Array[Byte]): AudioInputStream = {
    val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    if (fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED && fmt.getSampleSizeInBits == 16) in
    else AudioSystem.getAudioInputStream(
      new AudioFormat(fmt.getSampleRate, 16, fmt.getChannels, true, false), in)
  }

  /** Streamed 16-window RMS pass over up to nFrames; 64 KiB chunks.
    * Returns (features, frames actually read — fewer only at EOF). */
  private def streamWindows(pcm: AudioInputStream, nFrames: Long,
                            f: AudioFormat): (Array[Float], Long) = {
    val ch = f.getChannels
    val frameSize = f.getFrameSize
    val chunkFrames = math.max(1, (64 << 10) / frameSize)
    val chunk = new Array[Byte](chunkFrames * frameSize)
    val sumSq = new Array[Double](16)
    val cnt = new Array[Long](16)
    val big = f.isBigEndian
    var fr = 0L
    var eof = false
    while (fr < nFrames && !eof) {
      val want = (math.min(chunkFrames.toLong, nFrames - fr) * frameSize).toInt
      val got = readFully(pcm, chunk, want)
      val gotFrames = got / frameSize
      if (gotFrames == 0) eof = true
      var k = 0
      while (k < gotFrames) {
        val w = ((fr + k) * 16L / nFrames).toInt
        var mix = 0.0
        var c = 0
        while (c < ch) {
          val o = k * frameSize + c * 2
          val s =
            if (big) ((chunk(o) << 8) | (chunk(o + 1) & 0xff)).toShort
            else ((chunk(o + 1) << 8) | (chunk(o) & 0xff)).toShort
          mix += s / 32768.0
          c += 1
        }
        mix /= ch
        sumSq(w) += mix * mix
        cnt(w) += 1
        k += 1
      }
      fr += gotFrames
    }
    val feats = Array.tabulate(16)(w =>
      if (cnt(w) == 0) 0.0f else math.sqrt(sumSq(w) / cnt(w)).toFloat)
    (feats, fr)
  }

  /** Read exactly `want` bytes unless EOF arrives first; returns bytes read. */
  private def readFully(in: AudioInputStream, buf: Array[Byte], want: Int): Int = {
    var off = 0
    var n = 0
    while (off < want && n >= 0) {
      n = in.read(buf, off, want - off)
      if (n > 0) off += n
    }
    off
  }

  /** The buffered-fallback feature pass (no declared frame length). */
  private def rmsWindows(data: Array[Byte], nFrames: Int, totalFrames: Long,
                         f: AudioFormat): AudioInfo = {
    val ch = f.getChannels
    val frameSize = f.getFrameSize
    val big = f.isBigEndian
    val sumSq = new Array[Double](16)
    val cnt = new Array[Long](16)
    var fr = 0
    while (fr < nFrames) {
      val w = (fr * 16L / nFrames).toInt
      var mix = 0.0
      var c = 0
      while (c < ch) {
        val o = fr * frameSize + c * 2
        val s =
          if (big) ((data(o) << 8) | (data(o + 1) & 0xff)).toShort
          else ((data(o + 1) << 8) | (data(o) & 0xff)).toShort
        mix += s / 32768.0
        c += 1
      }
      mix /= ch
      sumSq(w) += mix * mix
      cnt(w) += 1
      fr += 1
    }
    val feats = Array.tabulate(16)(w =>
      if (cnt(w) == 0) 0.0f else math.sqrt(sumSq(w) / cnt(w)).toFloat)
    AudioInfo(f.getSampleRate.toInt, ch, math.round(totalFrames * 1000.0 / f.getSampleRate), feats)
  }

  /** STUB decode for video: a real implementation would decode /
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
    * amortized across the batch, not re-created per row. Images and audio
    * decode for real; video uses the labeled stub. */
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
        kind match {
          case "image" =>
            decodeImage(bytes) match {
              case Some(img) =>
                MediaFeatures(id, kind, ok = true, len, hash,
                  img.getWidth, img.getHeight, 0, 0L, gridLuminance(img))
              case None =>
                MediaFeatures(id, kind, ok = false, len, hash, 0, 0, 0, 0L, Array.fill(16)(0.0f))
            }
          case "audio" =>
            decodeAudio(bytes) match {
              case Some(a) =>
                MediaFeatures(id, kind, ok = true, len, hash,
                  0, 0, a.sampleRate, a.durationMs, a.features)
              case None =>
                MediaFeatures(id, kind, ok = false, len, hash, 0, 0, 0, 0L, Array.fill(16)(0.0f))
            }
          case _ =>
            // STUB path: no video codec in this container
            MediaFeatures(id, kind, bytes != null && bytes.nonEmpty, len, hash,
              0, 0, 0, 0L, decodeStub(bytes))
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

  /** A real, deterministic WAV clip: 16-bit PCM mono sine (seeded freq,
    * amplitude and length) encoded through AudioSystem — exercises the
    * true decode path end-to-end. Returns (bytes, sampleRate, durationMs). */
  def syntheticWav(i: Long): (Array[Byte], Int, Long) = {
    // (i/3)%3, NOT i%3: syntheticMedia assigns kind 'audio' exactly when
    // i%3==1, so an i%3-derived rate would pin every audio row to 12 kHz
    // and leave the other decode branches unexercised (ADVICE r3)
    val sampleRate = 8000 + ((i / 3) % 3).toInt * 4000 // 8/12/16 kHz
    val nSamples = (sampleRate / 10 + (i % 7) * sampleRate / 50).toInt // 100-220 ms
    val freq = 220.0 + (i % 12) * 55.0
    val amp = 0.25 + 0.05 * (i % 5)
    val pcm = new Array[Byte](nSamples * 2)
    var k = 0
    while (k < nSamples) {
      val s = (32767 * amp * math.sin(2 * math.Pi * freq * k / sampleRate)).toInt.toShort
      pcm(2 * k) = (s & 0xff).toByte
      pcm(2 * k + 1) = ((s >> 8) & 0xff).toByte
      k += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    (bos.toByteArray, sampleRate, math.round(nSamples * 1000.0 / sampleRate))
  }

  /** Deterministic synthetic media table for tests/bench: image rows carry
    * REAL PNG payloads, audio rows REAL WAV payloads (both decoded by the
    * real paths above); video rows carry opaque seeded bytes for the stub
    * path. No external data. */
  def syntheticMedia(spark: SparkSession, n: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val rows = spark.range(0, n, 1, partitions).as[Long].map { i =>
      val kind = (i % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      kind match {
        case "image" =>
          val (png, w, h) = syntheticPng(i)
          (i, kind, "image/png", png, Some(w), Some(h), None: Option[Long])
        case "audio" =>
          val (wav, _, durMs) = syntheticWav(i)
          (i, kind, "audio/wav", wav, None: Option[Int], None: Option[Int], Some(durMs))
        case _ =>
          val len = 64 + (i % 512).toInt
          val bytes = Array.tabulate[Byte](len)(k => ((i * 31 + k * 7) & 0xff).toByte)
          (i, kind, "video/webm",
            bytes, None: Option[Int], None: Option[Int], Some(1000L + i % 60000))
      }
    }.toDF("media_id", "kind", "mime", "bytes", "meta_width", "meta_height", "meta_duration_ms")
    rows
  }
}
