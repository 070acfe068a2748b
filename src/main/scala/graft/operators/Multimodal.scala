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

/** One perceptually-hashed image (the dHash path's output shape).
  * `hash_ok=false` marks payloads that do not decode OR are smaller than
  * the 9×8 hash grid (a hash over sub-grid pixels is meaningless) — data,
  * not exceptions, same ladder as [[ImageFeatures]].
  */
final case class ImageHash(
    doc_id: Long,
    dhash: Long,
    hash_ok: Boolean)

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

/** One REALLY-decoded sampled video frame (the AVI/RIFF path's output
  * shape). One row per SAMPLED frame — frames skipped by the sampling
  * stride are never decoded, the property that matters at scale.
  * `decode_ok=false` with `frame_idx = -1` marks an unparseable
  * container; with a real index, an undecodable single frame.
  */
final case class VideoFrameFeatures(
    doc_id: Long,
    frame_idx: Int,
    width: Int,
    height: Int,
    mean_r: Double,
    mean_g: Double,
    mean_b: Double,
    decode_ok: Boolean)

/** Multimodal column handling for training-data pipelines: media travels
  * as opaque `binary` columns with typed metadata; decode/feature-extract
  * runs as a partition-parallel typed pipeline (`mapPartitions` — the
  * Scala analog of `mapInPandas` batch UDFs: one iterator per partition,
  * amortized per-batch setup, no per-row driver involvement).
  *
  * All three modalities decode with REAL codecs: images via
  * `javax.imageio` ([[Multimodal.decodeImages]]), audio via
  * `javax.sound.sampled` plus the in-repo [[FlacCodec]] (fixed AND LPC
  * predictors, stereo decorrelation — the encoder-default FLAC
  * profiles; [[Multimodal.decodeAudio]]), video via a pure-Scala
  * AVI/RIFF container walk with raw-DIB exact decode and MJPEG through
  * the JDK JPEG reader ([[Multimodal.decodeVideoFrames]]). Only
  * [[Multimodal.decodeStub]] remains as the documented seam where a
  * deployment would plug richer codecs (H.264, lossy VP8, MP3
  * sample decode) with the same partition-parallel signature; WebP
  * lossless is real via the in-repo [[Vp8lCodec]], and the MP3 / MP4
  * CONTAINER level (frame walks, durations, bitrate profiles, sample
  * tables, keyframe byte ranges) is real via [[Mp3Codec]] /
  * [[Mp4Codec]] — the seam covers bitstream sample decode only.
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

  /** The [[JpegCodec]] 64M-pixel allocation cap, shared by the JDK
    * `ImageIO` fallback: header dims are attacker-controlled, and a raster
    * allocation driven by them must be bounded BEFORE it happens.
    */
  private[operators] val MaxDecodePixels: Long = 1L << 26

  /** Allocation-guarded `ImageIO` decode. `ImageIO.read` allocates the
    * full raster from header-declared dimensions, so a crafted 65k×65k
    * header OOMs the executor — and `OutOfMemoryError` is an Error, so it
    * ESCAPES the callers' `catch { case _: Exception }` quarantine (the
    * exact failure mode [[JpegCodec]]'s cap closes for the from-spec
    * path). Probe width/height from the stream via the format reader
    * (header-only, no raster) and skip the decode when w·h exceeds the
    * same 64M-pixel cap. Undecodable/oversized payloads return null —
    * data, not exceptions, same ladder as every caller.
    */
  private[operators] def safeImageRead(
      bytes: Array[Byte], off: Int, len: Int): java.awt.image.BufferedImage =
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes, off, len))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val w = reader.getWidth(0); val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxDecodePixels) null
            else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => null }

  private[operators] def safeImageRead(bytes: Array[Byte]): java.awt.image.BufferedImage =
    if (bytes == null) null else safeImageRead(bytes, 0, bytes.length)

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
          // WebP: ImageIO has no plugin — the in-repo VP8L codec decodes
          // the lossless profile; lossy VP8/VP8X land on decode_ok=false
          val isWebp = bytes != null && bytes.length >= 16 &&
            bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
            bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'E' &&
            bytes(10) == 'B' && bytes(11) == 'P'
          // JPEG: the in-repo baseline decoder first (ITU T.81
          // from-spec, [[JpegCodec]], baseline AND progressive AND
          // sequential CMYK/YCCK AND 12-bit); arithmetic-coded files
          // fall through to the JDK reader below. Behavior note: the
          // from-spec path upsamples chroma nearest-neighbor where the
          // JDK reader interpolates, so mean_r/g/b on real 4:2:0
          // content shift a few LSBs vs a JDK-decoded feature run
          // (fixtures and the locked oracles are unaffected —
          // q_multimodal_decode is png/bmp-only)
          val isJpeg = bytes != null && bytes.length >= 2 &&
            (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8
          val fromSpecJpeg = if (isJpeg) JpegCodec.decode(bytes) else None
          if (isWebp) {
            Vp8lCodec.decode(bytes) match {
              case None =>
                ImageFeatures(id, bytes.length.toLong, -1, -1, 0,
                  0.0, 0.0, 0.0, decode_ok = false)
              case Some(d) =>
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < d.argb.length) {
                  val p = d.argb(i)
                  sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
                  i += 1
                }
                val n = d.argb.length.toDouble
                ImageFeatures(id, bytes.length.toLong, d.width, d.height, 4,
                  sr / n, sg / n, sb / n, decode_ok = true)
            }
          } else if (fromSpecJpeg.isDefined) {
            val d = fromSpecJpeg.get
            var sr = 0L; var sg = 0L; var sb = 0L
            var i = 0
            while (i < d.argb.length) {
              val p = d.argb(i)
              sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
              i += 1
            }
            val n = d.argb.length.toDouble
            ImageFeatures(id, bytes.length.toLong, d.width, d.height, d.nComp,
              sr / n, sg / n, sb / n, decode_ok = true)
          } else {
          // a null payload is as much data as an undecodable one
          val img = safeImageRead(bytes)
          if (img == null)
            ImageFeatures(id, if (bytes == null) 0L else bytes.length.toLong,
              -1, -1, 0, 0.0, 0.0, 0.0, decode_ok = false)
          else {
            val (mr, mg, mb) = rgbMeans(img)
            ImageFeatures(id, bytes.length.toLong, img.getWidth, img.getHeight,
              img.getColorModel.getNumComponents, mr, mg, mb,
              decode_ok = true)
          }
          }
        }
      }
  }

  /** 64-bit difference hash (dHash) of a decoded image — the standard
    * perceptual fingerprint for image near-dup detection: resize-, crop-
    * tail- and re-encode-tolerant, because it keys on the SIGN of adjacent
    * brightness gradients, not pixel values. Algorithm (public, from the
    * perceptual-hashing literature):
    *
    *   1. integer luma per pixel: (77·r + 150·g + 29·b) >> 8 — the fixed-
    *      point BT.601 weights, exact in Int;
    *   2. area-downsample to a 9×8 grid with floor boundaries
    *      (block i spans [⌊i·w/9⌋, ⌊(i+1)·w/9⌋)); block compares use
    *      cross-multiplied Long sums, so NO division rounding anywhere;
    *   3. bit (row, col) = 1 iff block(col) is brighter than block(col+1):
    *      64 gradient signs = one Long.
    *
    * The whole pipeline is integer arithmetic over losslessly-decoded
    * pixels, so the hash is bit-reproducible by ANY engine from the pixel
    * formulas alone — the property the literal SQL oracle relies on.
    *
    * Scale shape: same as [[decodeImages]] — one narrow partition-parallel
    * pass, no shuffle; pair it with [[Dedup.hammingPairs64]] for the
    * banded near-dup join (pigeonhole chunking, never a cross join).
    */
  def dhash64(media: DataFrame)(implicit spark: SparkSession): Dataset[ImageHash] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = safeImageRead(bytes)
          if (img == null || img.getWidth < 9 || img.getHeight < 8)
            ImageHash(id, 0L, hash_ok = false)
          else ImageHash(id, dhashOf(img), hash_ok = true)
        }
      }
  }

  /** The 9×8-grid gradient hash of one decoded image (see [[dhash64]]). */
  private def dhashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var j = 0
    while (j < 8) {
      val y0 = j * h / 8; val y1 = (j + 1) * h / 8
      var i = 0
      while (i < 9) {
        val x0 = i * w / 9; val x1 = (i + 1) * w / 9
        var s = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += (77 * ((rgb >> 16) & 0xff) + 150 * ((rgb >> 8) & 0xff) +
              29 * (rgb & 0xff)) >> 8
            x += 1
          }
          y += 1
        }
        sums(j)(i) = s
        cnts(j)(i) = (y1 - y0).toLong * (x1 - x0)
        i += 1
      }
      j += 1
    }
    var hash = 0L
    j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        // avg(left) > avg(right) via cross-multiplication — exact in Long
        if (sums(j)(i) * cnts(j)(i + 1) > sums(j)(i + 1) * cnts(j)(i))
          hash |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    hash
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
          else if (bytes.length >= 4 && bytes(0) == 'f' && bytes(1) == 'L' &&
              bytes(2) == 'a' && bytes(3) == 'C') {
            // FLAC: the JDK has no reader — the in-repo [[FlacCodec]]
            // decodes it (fixed + LPC predictors, stereo decorrelation);
            // variable-blocksize streams land on the decode_ok=false
            // ladder
            FlacCodec.decode(bytes) match {
              case None => bad
              case Some(d) =>
                val n = d.samples.length
                var sum = 0L; var sumSq = 0L; var peak = 0
                var i = 0
                while (i < n) {
                  val v = d.samples(i)
                  sum += v; sumSq += v.toLong * v
                  val a = math.abs(v); if (a > peak) peak = a
                  i += 1
                }
                AudioFeatures(id, bytes.length.toLong, d.sampleRate,
                  d.channels, d.bits, n.toLong / d.channels,
                  rms = if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n),
                  mean_amp = if (n == 0) 0.0 else sum.toDouble / n,
                  peak = peak, decode_ok = true)
            }
          }
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

  // ----------------------------------------------------------------- video

  /** Per-channel pixel means through sRGB `getRGB` — ONE definition
    * shared by still-image decode and MJPEG frame decode, so channel
    * handling can never drift between the two paths.
    */
  private def rgbMeans(img: java.awt.image.BufferedImage): (Double, Double, Double) = {
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
    (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def fourCC(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Video stream format from the AVI header (BITMAPINFOHEADER of the
    * first `vids` stream): dims + bit depth + compression fourCC value.
    */
  private final case class AviVideoFormat(
      width: Int, height: Int, bitCount: Int, compression: Int)

  /** Parsed AVI: stream format + (offset, length) of every frame chunk of
    * stream 0 (`00db` raw DIB / `00dc` compressed), in stream order.
    * Pure structural walk — no frame bytes are touched here, which is
    * what makes stride sampling cheap: seeking costs chunk headers only.
    */
  private def parseAvi(bytes: Array[Byte]): Option[(AviVideoFormat, Vector[(Int, Int, Boolean)])] = {
    if (bytes == null || bytes.length < 12 ||
      fourCC(bytes, 0) != "RIFF" || fourCC(bytes, 8) != "AVI ") return None
    var fmt = Option.empty[AviVideoFormat]
    var lastStrhVids = false
    val frames = Vector.newBuilder[(Int, Int, Boolean)] // (off, len, isRawDib)
    // depth-capped: a forged file nesting LISTs ~100k deep would otherwise
    // StackOverflowError past any catch (Error, not Exception). Real AVIs
    // nest hdrl/strl/movi/rec ~4 levels; 64 is generous.
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 64) return
      var off = start
      while (off + 8 <= end) {
        val id = fourCC(bytes, off)
        val size = le32(bytes, off + 4)
        val dataOff = off + 8
        // bounds math in Long: a forged size near 2^31 overflows the Int
        // sum negative and would bypass the guard, then index negatively
        if (size < 0 || dataOff.toLong + size > end) return // truncated: stop cleanly
        id match {
          case "LIST" if size >= 4 =>
            walk(dataOff + 4, dataOff + size, depth + 1) // hdrl/strl/movi/rec
          case "strh" if size >= 4 =>
            lastStrhVids = fourCC(bytes, dataOff) == "vids"
          case "strf" if lastStrhVids && fmt.isEmpty && size >= 40 =>
            fmt = Some(AviVideoFormat(
              width = le32(bytes, dataOff + 4),
              height = le32(bytes, dataOff + 8),
              bitCount = le16(bytes, dataOff + 14),
              compression = le32(bytes, dataOff + 16)))
          case "00db" => frames += ((dataOff, size, true))
          case "00dc" => frames += ((dataOff, size, false))
          case _ => ()
        }
        off = dataOff + size + (size & 1) // chunks are word-aligned
      }
    }
    walk(12, bytes.length, 0)
    fmt.map((_, frames.result()))
  }

  /** REAL video frame sampling — AVI/RIFF container parse (pure Scala)
    * plus per-frame decode, every `everyK`-th frame only. Raw-DIB frames
    * (`00db`, BI_RGB 24-bit bottom-up BGR) decode exactly with integer
    * pixel math; MJPEG frames (`00dc`) decode through the JDK JPEG
    * reader. Skipped frames cost a chunk-header seek, never a decode —
    * at 100 TB the stride is the lever between "scan" and "decode" cost.
    * Container and per-frame failures land on the `decode_ok=false`
    * ladder as rows, not exceptions.
    */
  def decodeVideoFrames(media: DataFrame, everyK: Int)(
      implicit spark: SparkSession): Dataset[VideoFrameFeatures] = {
    require(everyK >= 1, "sampling stride must be >= 1")
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        parseAvi(bytes) match {
          case None =>
            Seq(VideoFrameFeatures(id, -1, -1, -1, 0.0, 0.0, 0.0, decode_ok = false))
          case Some((f, frames)) if frames.isEmpty =>
            // a container with no frame chunks (truncated movi) is as
            // undecodable as garbage — the doc must still yield a row
            Seq(VideoFrameFeatures(id, -1, -1, -1, 0.0, 0.0, 0.0, decode_ok = false))
          case Some((f, frames)) =>
            // forged headers are data: dims must be positive and the frame
            // payload must cover rowBytes·height WITHOUT int overflow
            val rawOk = f.compression == 0 && f.bitCount == 24 &&
              f.width > 0 && f.height > 0
            frames.indices.by(everyK).map { i =>
              val (off, len, isDib) = frames(i)
              val bad = VideoFrameFeatures(id, i, -1, -1, 0.0, 0.0, 0.0, decode_ok = false)
              if (isDib && rawOk) {
                val rowBytesL = (f.width.toLong * 3 + 3) / 4 * 4
                if (len.toLong < rowBytesL * f.height) bad
                else {
                  // guard passed → rowBytes·height ≤ len < 2³¹, so the
                  // narrowing and every row offset below are in range
                  val rowBytes = rowBytesL.toInt
                  // bottom-up BGR rows, word-padded; sums exact in Long
                  var sr = 0L; var sg = 0L; var sb = 0L
                  var y = 0
                  while (y < f.height) {
                    val row = off + (f.height - 1 - y) * rowBytes
                    var x = 0
                    while (x < f.width) {
                      val p = row + x * 3
                      sb += bytes(p) & 0xff; sg += bytes(p + 1) & 0xff; sr += bytes(p + 2) & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val n = f.width.toLong * f.height
                  VideoFrameFeatures(id, i, f.width, f.height,
                    sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, decode_ok = true)
                }
              } else {
                val img = safeImageRead(bytes, off, len)
                if (img == null) bad
                else {
                  val (mr, mg, mb) = rgbMeans(img)
                  VideoFrameFeatures(id, i, img.getWidth, img.getHeight,
                    mr, mg, mb, decode_ok = true)
                }
              }
            }
        }
      }
  }

  /** REAL animated-GIF frame sampling — the JDK GIF `ImageReader` walks
    * the frame sequence natively (`getNumImages` + indexed `read`), so a
    * second genuine multi-frame container joins AVI behind the same
    * `VideoFrameFeatures` shape; [[decodeStub]] keeps shrinking to the
    * codecs the repo truly lacks (H.264, lossy VP8, MP3). Frames are the RAW
    * per-frame rasters (no disposal-method compositing — corpus feature
    * extraction wants each frame's own pixels, and the synthetic-fixture
    * oracle pins full-frame rasters anyway). Skipped frames are never
    * decoded: `reader.read(i)` is indexed, so the stride skips whole LZW
    * payloads, the same scan-vs-decode lever as the AVI path. Container
    * and per-frame failures land on `decode_ok=false` rows, not
    * exceptions.
    */
  def decodeGifFrames(media: DataFrame, everyK: Int)(
      implicit spark: SparkSession): Dataset[VideoFrameFeatures] = {
    require(everyK >= 1, "sampling stride must be >= 1")
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val bad = VideoFrameFeatures(id, -1, -1, -1, 0.0, 0.0, 0.0, decode_ok = false)
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) Seq(bad)
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              if (!reader.getFormatName.equalsIgnoreCase("gif")) Seq(bad)
              else {
                val n = reader.getNumImages(true)
                if (n <= 0) Seq(bad)
                else (0 until n by everyK).map { i =>
                  try {
                    // same header-dims allocation guard as safeImageRead —
                    // per frame, since each GIF frame declares its own dims
                    val fw = reader.getWidth(i); val fh = reader.getHeight(i)
                    require(fw > 0 && fh > 0 && fw.toLong * fh <= MaxDecodePixels,
                      "gif frame over 64M-pixel allocation cap")
                    val img = reader.read(i)
                    val (mr, mg, mb) = rgbMeans(img)
                    VideoFrameFeatures(id, i, img.getWidth, img.getHeight,
                      mr, mg, mb, decode_ok = true)
                  } catch {
                    case _: Exception =>
                      VideoFrameFeatures(id, i, -1, -1, 0.0, 0.0, 0.0,
                        decode_ok = false)
                  }
                }
              }
            } finally reader.dispose()
          }
        } catch { case _: Exception => Seq(bad) }
      }
  }

  /** Deterministic synthetic animated GIF via the JDK's sequence writer:
    * frame `f` is a LOSSLESS two-color raster — left half
    * (r, g, b) = ((29·seed + 11f) mod 256, (41·seed + 7f) mod 256,
    * (11·seed + 3f) mod 256), right half black — so the 256-entry GIF
    * palette holds every color exactly and per-frame means have closed
    * forms a SQL oracle can re-derive: mean_c = c · ⌈w/2⌉ / w.
    */
  def syntheticAnimatedGif(w: Int, h: Int, nFrames: Int, seed: Int): Array[Byte] = {
    require(w >= 2 && h >= 1 && nFrames >= 1, "degenerate GIF fixture")
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      (0 until nFrames).foreach { f =>
        val r = (seed * 29 + f * 11) % 256
        val g = (seed * 41 + f * 7) % 256
        val b = (seed * 11 + f * 3) % 256
        // EXPLICIT 2-entry palette: a TYPE_INT_RGB source would let the
        // JDK GIF writer quantize through its default web palette (and
        // dither) — indexed input round-trips bit-exactly instead
        val icm = new java.awt.image.IndexColorModel(8, 2,
          Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte),
          Array(b.toByte, 0.toByte))
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val left = (r << 16) | (g << 8) | b
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, if (x < (w + 1) / 2) left else 0)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  private def riffChunk(id: String, data: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + data.length + (data.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(id.getBytes("US-ASCII")).putInt(data.length).put(data)
    bb.array() // trailing pad byte (if any) stays zero
  }
  private def riffList(listType: String, children: Array[Byte]*): Array[Byte] =
    riffChunk("LIST", listType.getBytes("US-ASCII") ++ children.flatten)

  /** Deterministic synthetic AVI: `nFrames` uncompressed 24-bit DIB
    * frames (`00db`, BI_RGB bottom-up), frame `f` pixel (x, y) carrying
    * r = 2x+f, g = 4y+2f, b = 37 — integer-exact closed forms
    * (mean_r = w−1+f, mean_g = 2(h−1)+2f for w ≤ 32, h ≤ 16, f ≤ 19),
    * so a SQL oracle re-derives sampled-frame features without a codec.
    * Proper hdrl (avih + strl/strh/strf) so any AVI reader accepts it.
    * With `mjpeg=true` the frames are JDK-encoded JPEGs in `00dc` chunks
    * (strf compression 'MJPG') — lossy, so no closed forms, but it
    * exercises the compressed-frame decode path with real codec bytes.
    */
  def syntheticAvi(w: Int, h: Int, nFrames: Int, mjpeg: Boolean = false): Array[Byte] = {
    require(w <= 32 && h <= 16 && nFrames <= 20, "closed-form range exceeded")
    val rowBytes = (w * 3 + 3) / 4 * 4
    val frameSize = rowBytes * h
    def u32s(vals: Int*): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(vals.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      vals.foreach(bb.putInt); bb.array()
    }
    val avih = riffChunk("avih", u32s(
      100000, 0, 0, 0, nFrames, 0, 1, frameSize, w, h, 0, 0, 0, 0))
    val strh = riffChunk("strh",
      "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
        u32s(0, 0, 0, 1, 10, 0, nFrames, frameSize, -1, 0) ++
        u32s((w << 16), (h << 16))) // rcFrame as two packed u16 pairs
    val strf = riffChunk("strf", {
      val bb = java.nio.ByteBuffer.allocate(40)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(if (mjpeg) 0x47504a4d else 0) // 'MJPG' | BI_RGB
        .putInt(frameSize).putInt(0).putInt(0).putInt(0).putInt(0)
      bb.array()
    })
    val frames = (0 until nFrames).map { f =>
      if (mjpeg) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((2 * x + f) << 16) | ((4 * y + 2 * f) << 8) | 37)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "jpg", bos), "no JDK JPEG encoder")
        riffChunk("00dc", bos.toByteArray)
      } else {
        val data = new Array[Byte](frameSize)
        var y = 0
        while (y < h) {
          val row = (h - 1 - y) * rowBytes // bottom-up
          var x = 0
          while (x < w) {
            val p = row + x * 3
            data(p) = 37.toByte                  // B
            data(p + 1) = (4 * y + 2 * f).toByte // G
            data(p + 2) = (2 * x + f).toByte     // R
            x += 1
          }
          y += 1
        }
        riffChunk("00db", data)
      }
    }
    val body = riffList("hdrl", avih, riffList("strl", strh, strf)) ++
      riffList("movi", frames: _*)
    riffChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ body)
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

  /** Deterministic 16-bit PCM payload through the JDK's OWN encoders for
    * the non-RIFF container family — AIFF and AU, both big-endian signed
    * PCM (`javax.sound.sampled.AudioSystem.write`). Same integer sample
    * formula as [[syntheticWav]] (`((i·37 + c·11) mod 201) − 100`), but
    * the bytes come from the real encoder, so the fixture exercises the
    * full JDK encoder→decoder round trip for each container rather than
    * a hand-built header. [[decodeAudio]] needs no changes to read these:
    * its 16-bit branch already handles either endianness.
    */
  def syntheticPcm16(
      nFrames: Int, sampleRate: Int, channels: Int, container: String): Array[Byte] = {
    val raw = java.nio.ByteBuffer.allocate(nFrames * channels * 2) // big-endian default
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        raw.putShort(((i * 37 + c * 11) % 201 - 100).toShort)
        c += 1
      }
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, channels, true, true)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw.array()), fmt, nFrames.toLong)
    val fileType = container match {
      case "aiff" => javax.sound.sampled.AudioFileFormat.Type.AIFF
      case "au"   => javax.sound.sampled.AudioFileFormat.Type.AU
      case other  => throw new IllegalArgumentException(
        s"unsupported synthetic container $other (aiff | au)")
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais, fileType, bos)
    bos.toByteArray
  }

  /** Deterministic FLAC fixture through the in-repo [[FlacCodec]]
    * encoder: same integer sample formula as [[syntheticWav]]
    * (`((i·37 + c·11) mod 201) − 100`), 16-bit, so the closed-form
    * rms/mean/peak oracle of the WAV family applies verbatim —
    * lossless-ness IS the check. Strategy "fixed2" exercises the real
    * compression path (order-2 fixed predictor + Rice residuals);
    * "verbatim"/"constant" cover the other subframe types.
    */
  def syntheticFlac(
      nFrames: Int, sampleRate: Int, channels: Int,
      strategy: String = "fixed2", stereo: String = "independent",
      blockSizes: Seq[Int] = Nil): Array[Byte] = {
    val samples = new Array[Int](nFrames * channels)
    var i = 0
    while (i < nFrames) {
      var c = 0
      while (c < channels) {
        samples(i * channels + c) = (i * 37 + c * 11) % 201 - 100
        c += 1
      }
      i += 1
    }
    FlacCodec.encode(samples, sampleRate, channels, bits = 16,
      blockSize = 256, strategy = strategy, stereo = stereo,
      blockSizes = blockSizes)
  }

  /** Deterministic WebP-lossless fixture through the in-repo
    * [[Vp8lCodec]]: the [[syntheticImage]] pattern (r = x mod 256,
    * g = y mod 256, b = 37). VP8L is lossless, so the closed-form means
    * hold exactly, like PNG/BMP/TIFF; `subtractGreen` routes the stream
    * through a real transform on the registered path.
    */
  def syntheticWebp(w: Int, h: Int, subtractGreen: Boolean = false): Array[Byte] = {
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (0xFF << 24) | ((x % 256) << 16) | ((y % 256) << 8) | 37
    }
    Vp8lCodec.encode(w, h, px, subtractGreen)
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

  /** Deterministic synthetic image with a NONLINEAR pattern —
    * r = (7x² + 13y + 29·seed) mod 256, g = (5y² + 11x + 41·seed) mod 256,
    * b = (xy + 11·seed) mod 256 — plus an optional white perturbation box
    * (x0, y0, boxW, boxH). Distinct seeds produce images ~20+ dHash bits
    * apart; a small perturbation box flips only the handful of gradient
    * signs its blocks touch — the planted-near-dup fixture for
    * [[dhash64]]. True-color codecs only ("png", "bmp"): the pixel math
    * must survive the round-trip exactly for the literal oracle to hold.
    */
  def syntheticPatternImage(
      w: Int, h: Int, seed: Int,
      perturb: Option[(Int, Int, Int, Int)],
      format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val inBox = perturb.exists { case (x0, y0, pw, ph) =>
          x >= x0 && x < x0 + pw && y >= y0 && y < y0 + ph
        }
        val rgb =
          if (inBox) 0xffffff
          else {
            val r = (x * x * 7 + y * 13 + seed * 29) % 256
            val g = (y * y * 5 + x * 11 + seed * 41) % 256
            val b = (x * y + seed * 11) % 256
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
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

  final case class ResizedImage(
      doc_id: Long, ok: Boolean, out_w: Int, out_h: Int,
      sum_r: Long, sum_g: Long, sum_b: Long,
      wsum_r: Long, wsum_g: Long, wsum_b: Long)

  /** REAL pixel resize — area box downsample to a fixed (tw × th)
    * grid over losslessly-decoded pixels, ALL integer arithmetic so
    * any engine reproduces it from the pixel formulas alone (the
    * [[dhash64]] property, extended to actual resample output):
    *
    *   - block (i, j) spans x ∈ [⌊i·w/tw⌋, ⌊(i+1)·w/tw⌋) and the y
    *     analogue — the floor-boundary convention shared with dHash;
    *   - output channel value = ⌊Σ channel / box size⌋ (floor
    *     division, no floating point anywhere);
    *   - the row carries plain and position-weighted channel sums of
    *     the RESIZED grid (weight 1 + i + j·tw), so a hash match
    *     witnesses every output pixel's value AND position.
    *
    * Images smaller than the target grid (or undecodable) surface
    * `ok = false` — never a silent upscale. Scale shape: one narrow
    * partition-parallel pass, decode + O(w·h) integer sums per row,
    * no shuffle.
    */
  def resizePixels(media: DataFrame, tw: Int, th: Int)(
      implicit spark: SparkSession): Dataset[ResizedImage] = {
    import spark.implicits._
    media.select(col("doc_id"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = safeImageRead(bytes)
          if (img == null || img.getWidth < tw || img.getHeight < th)
            ResizedImage(id, ok = false, 0, 0, 0L, 0L, 0L, 0L, 0L, 0L)
          else {
            val w = img.getWidth; val h = img.getHeight
            var sr = 0L; var sg = 0L; var sb = 0L
            var wr = 0L; var wg = 0L; var wb = 0L
            var j = 0
            while (j < th) {
              val y0 = j * h / th; val y1 = (j + 1) * h / th
              var i = 0
              while (i < tw) {
                val x0 = i * w / tw; val x1 = (i + 1) * w / tw
                var br = 0L; var bg = 0L; var bb = 0L
                var y = y0
                while (y < y1) {
                  var x = x0
                  while (x < x1) {
                    val p = img.getRGB(x, y)
                    br += (p >> 16) & 0xFF; bg += (p >> 8) & 0xFF; bb += p & 0xFF
                    x += 1
                  }
                  y += 1
                }
                val cnt = (x1 - x0).toLong * (y1 - y0)
                val vr = br / cnt; val vg = bg / cnt; val vb = bb / cnt
                val wt = 1L + i + j.toLong * tw
                sr += vr; sg += vg; sb += vb
                wr += vr * wt; wg += vg * wt; wb += vb * wt
                i += 1
              }
              j += 1
            }
            ResizedImage(id, ok = true, tw, th, sr, sg, sb, wr, wg, wb)
          }
        }
      }
  }

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
