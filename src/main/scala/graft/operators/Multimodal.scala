package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One decoded media asset (the stub decoder's output shape). */
final case class MediaFeatures(
    doc_id: Long,
    byte_len: Long,
    width: Int,
    height: Int,
    n_frames: Int,
    content_hash: Long)

/** One REALLY-decoded image (the javax.imageio path's output shape).
  * `decode_ok=false` rows carry -1 dims / 0 channels — undecodable
  * payloads are data, not exceptions (same ladder as AbiCodec ds_error).
  */
final case class ImageFeatures(
    doc_id: Long,
    byte_len: Long,
    width: Int,
    height: Int,
    channels: Int,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double,
    decode_ok: Boolean)

/** One REALLY-decoded audio asset (the javax.sound.sampled path's output
  * shape). Amplitude stats are over RAW integer sample values (16-bit:
  * [-32768, 32767]; 8-bit unsigned rebased to [-128, 127]) — integers
  * keep the cross-engine math exact (sum/sum-of-squares accumulate in
  * Long; the only doubles are one terminal division and one IEEE sqrt).
  * `decode_ok=false` rows carry -1 dims — undecodable payloads are data,
  * not exceptions (same ladder as AbiCodec ds_error).
  */
final case class AudioFeatures(
    doc_id: Long,
    byte_len: Long,
    sample_rate: Int,
    channels: Int,
    bits: Int,
    n_frames: Long,
    rms: Double,
    mean_amp: Double,
    peak: Int,
    decode_ok: Boolean)

/** Multimodal column handling for training-data pipelines: media travels
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as a partition-parallel typed pipeline (`mapPartitions` — the
  * Scala analog of `mapInPandas` batch UDFs: one iterator per partition,
  * amortized per-batch setup, no per-row driver involvement).
  *
  * The actual codec is STUBBED (image/audio libraries are not in this
  * container): `decodeStub` derives deterministic fake dimensions from
  * the payload length, clearly marked below. The Spark-side plumbing —
  * binary schema, metadata struct, partitioning, batch shape — is real
  * and is what the operator tests exercise.
  */
object Multimodal {

  /** Wrap any table into (id, content binary, meta struct) media shape. */
  def toMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("content"),
      struct(
        length(col(payloadCol)).cast("long").as("byte_len"),
        lit("application/octet-stream").as("mime")).as("meta"))

  /** ===== STUB DECODER =====
    * Deterministic fake of an image/video decode: dimensions and frame
    * count derived arithmetically from payload length; a real deployment
    * replaces the body with the actual codec call (per-partition init,
    * same signature). The formulas are mirrored by the SQL oracle.
    */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" happens here in a real decoder
        it.map { case (id, bytes) =>
          val n = bytes.length.toLong
          MediaFeatures(
            doc_id = id,
            byte_len = n,
            width = ((n * 7) % 512 + 16).toInt,
            height = ((n * 13) % 512 + 16).toInt,
            n_frames = (n % 10 + 1).toInt,
            content_hash = bytes.foldLeft(1469598103934665603L)((h, b) =>
              (h ^ (b & 0xffL)) * 1099511628211L)) // FNV-1a 64
        }
      }
  }

  /** REAL image decode — PNG/BMP/GIF via `javax.imageio` (JDK-standard
    * plugins, no external libs): width/height/channel-count plus exact
    * per-channel pixel means, partition-parallel with per-partition codec
    * init. Pixels are read through `getRGB` (sRGB-normalized), so the
    * features are independent of the on-disk sample layout (PNG's RGB vs
    * BMP's BGR decode to the same values). Video stays behind
    * [[decodeStub]] — no video codec ships with the JDK.
    *
    * Scale shape: identical to the stub — one narrow typed pass, decode
    * cost strictly per-row, no shuffle; at 100 TB the only knob that
    * matters is input-split sizing so one oversized asset cannot skew a
    * partition (pair with [[graft.sources.Layout]] target sizing).
    */
  def decodeImages(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init: no temp-file cache, one scanline buffer
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          // a null payload is as much data as an undecodable one
          val img =
            if (bytes == null) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
          if (img == null)
            ImageFeatures(id, if (bytes == null) 0L else bytes.length.toLong,
              -1, -1, 0, 0.0, 0.0, 0.0, decode_ok = false)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            ImageFeatures(id, bytes.length.toLong, w, h,
              img.getColorModel.getNumComponents,
              sr.toDouble / n, sg.toDouble / n, sb.toDouble / n,
              decode_ok = true)
          }
        }
      }
  }

  /** REAL audio decode — WAV/RIFF via `javax.sound.sampled.AudioSystem`
    * (JDK-standard codec, no external libs): format metadata plus exact
    * integer-domain amplitude stats (RMS, mean, peak over raw sample
    * values, all channels interleaved), partition-parallel. Supports the
    * PCM layouts the JDK reader emits for WAV — 16-bit signed (either
    * endianness) and 8-bit (unsigned or signed); anything else (float
    * PCM, 24-bit, compressed) lands on the `decode_ok=false` ladder
    * rather than throwing.
    *
    * Scale shape: identical to [[decodeImages]] — one narrow typed pass,
    * decode cost strictly per-row, no shuffle.
    */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val bad = AudioFeatures(id, if (bytes == null) 0L else bytes.length.toLong,
            -1, -1, -1, -1L, 0.0, 0.0, 0, decode_ok = false)
          if (bytes == null) bad
          else try {
            val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            val fmt = ais.getFormat
            val enc = fmt.getEncoding
            val bits = fmt.getSampleSizeInBits
            val ch = fmt.getChannels
            val signed = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
            val unsigned = enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED
            val data = ais.readAllBytes()
            ais.close()
            val supported = ch > 0 &&
              ((bits == 16 && signed) || (bits == 8 && (signed || unsigned)))
            if (!supported) bad
            else {
              val step = bits / 8
              val n = data.length / step // sample count across channels
              var sum = 0L; var sumSq = 0L; var peak = 0
              var i = 0
              while (i < n) {
                val v =
                  if (bits == 16) {
                    val off = i * 2
                    if (fmt.isBigEndian) (data(off) << 8) | (data(off + 1) & 0xff)
                    else (data(off + 1) << 8) | (data(off) & 0xff)
                  } else if (unsigned) (data(i) & 0xff) - 128
                  else data(i).toInt
                sum += v; sumSq += v.toLong * v
                val a = math.abs(v); if (a > peak) peak = a
                i += 1
              }
              AudioFeatures(id, bytes.length.toLong, fmt.getSampleRate.toInt,
                ch, bits, n.toLong / ch,
                rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
                mean_amp = if (n == 0) 0.0 else sum.toDouble / n,
                peak = peak, decode_ok = true)
            }
          } catch { case _: Exception => bad }
        }
      }
  }

  /** Deterministic synthetic WAV: frame `i`, channel `c` carries the raw
    * integer sample `((i*37 + c*11) mod 201) − 100` — closed-form, exactly
    * re-derivable by a SQL oracle in integer arithmetic. Written as a
    * spec-standard RIFF container (PCM; 16-bit signed LE or 8-bit
    * unsigned), byte-for-byte deterministic.
    */
  def syntheticWav(nFrames: Int, sampleRate: Int, channels: Int, bits: Int): Array[Byte] = {
    require(bits == 16 || bits == 8, s"unsupported synthetic bit depth $bits")
    val step = bits / 8
    val dataSize = nFrames * channels * step
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * step) // byte rate
      .putShort((channels * step).toShort)  // block align
      .putShort(bits.toShort)
    bb.put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        val v = (i * 37 + c * 11) % 201 - 100
        if (bits == 16) bb.putShort(v.toShort)
        else bb.put((v + 128).toByte) // 8-bit WAV is unsigned
        c += 1
      }
      i += 1
    }
    bb.array()
  }

  /** Deterministic synthetic image: red = x mod 256, green = y mod 256,
    * blue = 37, encoded with the named JDK codec. The closed-form decode
    * features — mean_r = (w−1)/2, mean_g = (h−1)/2, mean_b = 37 (w,h ≤
    * 256) — hold for the TRUE-COLOR codecs ("png", "bmp"); GIF's 256-color
    * palette quantizes the ~w·h distinct colors of this pattern, so a GIF
    * round-trip decodes fine but does not satisfy the literal formulas.
    */
  def syntheticImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((x % 256) << 16) | ((y % 256) << 8) | 37)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, bos),
      s"no JDK encoder for format $format")
    bos.toByteArray
  }

  /** Frame sampling plan: every k-th frame index of each asset —
    * demonstrates the explode-shaped stage that follows decode in a real
    * video pipeline (one row per sampled frame).
    */
  def sampleFrames(features: Dataset[MediaFeatures], everyK: Int)(
      implicit spark: SparkSession): DataFrame =
    features.toDF()
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))

  /** Resize stub: target box arithmetic (aspect-preserving fit), pure
    * column math — the real pixel work would live in the decode stage.
    */
  def resizePlan(features: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / col("width"),
      lit(maxSide.toDouble) / col("height"),
      lit(1.0))
    features.withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }
}
