package graft.operators

/** Pure-JVM MP3 container/frame walk (ISO/IEC 11172-3 §2.4 frame
  * grammar + the de-facto ID3v2/ID3v1/Xing conventions) — the
  * [[Mp4Codec]] pattern applied to the most common audio payload a
  * crawled corpus carries: REAL metadata extraction (frame count,
  * exact sample count, duration, bitrate profile, VBR detection)
  * without decoding one audio sample. The Huffman/IMDCT/filterbank
  * DECODE stays honestly behind the [[Multimodal.decodeStub]] seam;
  * everything a corpus-level audio pipeline filters or buckets on
  * (duration histograms, bitrate floors, VBR flags, tag-stripping
  * offsets) is resolved here from the headers alone, bytes-linear.
  *
  * Subset, honestly: Layers I–III under MPEG-1 and Layer III under
  * MPEG-2/2.5 (the combinations that exist in the wild); free-format
  * streams (bitrate index 0 — frame length undefined without decode)
  * and reserved version/layer/rate codes return None. All frames must
  * agree on version/layer/sample-rate (the stream contract real
  * demuxers enforce); bitrate may vary per frame — that is what VBR
  * IS, and min ≠ max is the is_vbr signal. A Xing/Info tag in the
  * first frame (at the spec side-info offset) is parsed for its frame
  * count when present.
  *
  * Everything emitted is INTEGER (total_samples = n_frames ×
  * samples/frame; duration_ms = total_samples·1000 ÷ rate, integer
  * division) so the `q_audio_mp3_meta` oracle replays closed-form.
  */
object Mp3Codec {

  final case class Meta(
      version: String, // "1" | "2" | "2.5"
      layer: Int, // 1..3
      sampleRate: Int,
      channels: Int, // 1 mono, else 2
      nFrames: Long,
      totalSamples: Long,
      durationMs: Long,
      bitrateMinKbps: Int,
      bitrateMaxKbps: Int,
      xingFrames: Long, // -1 when absent
      id3v2Bytes: Long, // 0 when absent
      hasId3v1: Boolean)

  // bitrate tables in kbps, index 1..14 (0 = free, 15 = bad)
  private val BrV1L1 = Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val BrV1L2 = Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
  private val BrV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BrV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Long =
    ((u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)) & 0xFFFFFFFFL

  /** Walk the stream; None on anything outside the documented subset. */
  def parse(bytes: Array[Byte]): Option[Meta] = {
    try parseOrThrow(bytes) catch { case _: Exception => None }
  }

  private def parseOrThrow(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 4) return None
    var pos = 0
    // ID3v2 prefix: "ID3" ver(2) flags(1) syncsafe-size(4)
    var id3v2 = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((u8(bytes, 6) & 0x7f) << 21) | ((u8(bytes, 7) & 0x7f) << 14) |
        ((u8(bytes, 8) & 0x7f) << 7) | (u8(bytes, 9) & 0x7f)
      id3v2 = 10L + size
      pos = id3v2.toInt
    }
    // ID3v1 tail: fixed 128 bytes starting "TAG"
    var end = bytes.length
    val hasId3v1 = end - pos >= 128 && bytes(end - 128) == 'T' &&
      bytes(end - 127) == 'A' && bytes(end - 126) == 'G'
    if (hasId3v1) end -= 128

    var version = ""; var layer = 0; var rate = 0; var channels = 0
    var nFrames = 0L; var brMin = Int.MaxValue; var brMax = 0
    var xing = -1L
    while (pos < end) {
      if (end - pos < 4) return None // partial trailing frame header
      if (u8(bytes, pos) != 0xFF || (u8(bytes, pos + 1) & 0xE0) != 0xE0)
        return None // lost sync
      val vBits = (u8(bytes, pos + 1) >> 3) & 3
      val lBits = (u8(bytes, pos + 1) >> 1) & 3
      val v = vBits match {
        case 3 => "1"; case 2 => "2"; case 0 => "2.5"
        case _ => return None // reserved
      }
      val l = lBits match {
        case 1 => 3; case 2 => 2; case 3 => 1
        case _ => return None // reserved
      }
      if (v != "1" && l != 3) return None // MPEG-2/2.5 Layer I/II: out of subset
      val brIdx = (u8(bytes, pos + 2) >> 4) & 0xF
      if (brIdx == 0 || brIdx == 15) return None // free-format / bad
      val srIdx = (u8(bytes, pos + 2) >> 2) & 3
      if (srIdx == 3) return None // reserved
      val pad = (u8(bytes, pos + 2) >> 1) & 1
      val mode = (u8(bytes, pos + 3) >> 6) & 3
      val ch = if (mode == 3) 1 else 2
      val sr = (v match {
        case "1" => RateV1; case "2" => RateV2; case _ => RateV25
      })(srIdx)
      val br = 1000 * ((v, l) match {
        case ("1", 1) => BrV1L1(brIdx)
        case ("1", 2) => BrV1L2(brIdx)
        case ("1", 3) => BrV1L3(brIdx)
        case (_, 3) => BrV2L3(brIdx)
        case _ => return None
      })
      // stream-constant fields must agree across frames
      if (nFrames == 0L) { version = v; layer = l; rate = sr; channels = ch }
      else if (v != version || l != layer || sr != rate || ch != channels)
        return None
      val frameLen = layer match {
        case 1 => (12 * br / rate + pad) * 4
        case 2 => 144 * br / rate + pad
        case 3 =>
          if (version == "1") 144 * br / rate + pad
          else 72 * br / rate + pad // 576 samples/frame
      }
      if (frameLen < 4 || pos + frameLen > end) return None
      // Xing/Info VBR tag: first frame only, at the Layer-III side-info
      // offset (MPEG-1: 17 mono / 32 stereo; MPEG-2/2.5: 9 / 17)
      if (nFrames == 0L && layer == 3) {
        val side =
          if (version == "1") (if (ch == 1) 17 else 32)
          else (if (ch == 1) 9 else 17)
        val o = pos + 4 + side
        if (o + 8 <= pos + frameLen &&
          ((bytes(o) == 'X' && bytes(o + 1) == 'i' && bytes(o + 2) == 'n' && bytes(o + 3) == 'g') ||
            (bytes(o) == 'I' && bytes(o + 1) == 'n' && bytes(o + 2) == 'f' && bytes(o + 3) == 'o'))) {
          val flags = be32(bytes, o + 4)
          if ((flags & 1L) != 0 && o + 12 <= pos + frameLen)
            xing = be32(bytes, o + 8)
        }
      }
      brMin = math.min(brMin, br / 1000)
      brMax = math.max(brMax, br / 1000)
      nFrames += 1
      pos += frameLen
    }
    if (nFrames == 0L) return None
    val spf: Long = layer match {
      case 1 => 384L
      case 2 => 1152L
      case 3 => if (version == "1") 1152L else 576L
    }
    val totalSamples = nFrames * spf
    Some(Meta(version, layer, rate, channels, nFrames, totalSamples,
      totalSamples * 1000L / rate, brMin, brMax, xing, id3v2, hasId3v1))
  }

  // ------------------------------------------------------------- fixtures

  /** Fixture writer: a valid frame sequence with deterministic payload
    * bytes (never decoded — the walk reads headers only). `bitrates`
    * gives the per-frame kbps sequence (VBR when they differ); every
    * third frame sets the padding bit (exercises the +1-slot branch);
    * optional ID3v2 prefix / ID3v1 tail / Xing frame-count tag in the
    * first frame. Not an encoder — a container fixture, like
    * [[Mp4Codec.encode]].
    */
  def fixture(
      version: String,
      layer: Int,
      sampleRate: Int,
      channels: Int,
      bitrates: Seq[Int], // kbps per frame
      id3v2Size: Int = 0,
      id3v1: Boolean = false,
      xingFrames: Long = -1L): Array[Byte] = {
    val rates = version match {
      case "1" => RateV1; case "2" => RateV2; case _ => RateV25
    }
    val srIdx = rates.indexOf(sampleRate)
    require(srIdx >= 0, s"rate $sampleRate invalid for MPEG-$version")
    val table = (version, layer) match {
      case ("1", 1) => BrV1L1
      case ("1", 2) => BrV1L2
      case ("1", 3) => BrV1L3
      case (_, 3) => BrV2L3
      case other => throw new IllegalArgumentException(s"subset: $other")
    }
    val out = new java.io.ByteArrayOutputStream()
    if (id3v2Size > 0) {
      require(id3v2Size <= (1 << 28) - 1, "syncsafe bound")
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0))
      out.write(Array(
        ((id3v2Size >> 21) & 0x7f).toByte, ((id3v2Size >> 14) & 0x7f).toByte,
        ((id3v2Size >> 7) & 0x7f).toByte, (id3v2Size & 0x7f).toByte))
      (0 until id3v2Size).foreach(i => out.write((i * 7) % 251))
    }
    val vBits = version match { case "1" => 3; case "2" => 2; case _ => 0 }
    val lBits = layer match { case 3 => 1; case 2 => 2; case 1 => 3 }
    bitrates.zipWithIndex.foreach { case (kbps, i) =>
      val brIdx = table.indexOf(kbps)
      require(brIdx > 0, s"bitrate $kbps invalid for MPEG-$version L$layer")
      val pad = if (i % 3 == 2) 1 else 0
      val br = kbps * 1000
      val frameLen = layer match {
        case 1 => (12 * br / sampleRate + pad) * 4
        case 2 => 144 * br / sampleRate + pad
        case 3 =>
          if (version == "1") 144 * br / sampleRate + pad
          else 72 * br / sampleRate + pad
      }
      val frame = new Array[Byte](frameLen)
      frame(0) = 0xFF.toByte
      frame(1) = (0xE0 | (vBits << 3) | (lBits << 1) | 1).toByte // CRC absent
      frame(2) = ((brIdx << 4) | (srIdx << 2) | (pad << 1)).toByte
      frame(3) = (if (channels == 1) 0xC0 else 0x00).toByte
      var j = 4
      while (j < frameLen) { frame(j) = ((i * 31 + j * 7) % 251).toByte; j += 1 }
      if (i == 0 && layer == 3 && xingFrames >= 0) {
        val side =
          if (version == "1") (if (channels == 1) 17 else 32)
          else (if (channels == 1) 9 else 17)
        val o = 4 + side
        require(o + 12 <= frameLen, "frame too small for a Xing tag")
        // side info zeroed, then Xing + flags(frames) + count
        java.util.Arrays.fill(frame, 4, o, 0.toByte)
        frame(o) = 'X'; frame(o + 1) = 'i'; frame(o + 2) = 'n'; frame(o + 3) = 'g'
        frame(o + 4) = 0; frame(o + 5) = 0; frame(o + 6) = 0; frame(o + 7) = 1
        frame(o + 8) = ((xingFrames >> 24) & 0xff).toByte
        frame(o + 9) = ((xingFrames >> 16) & 0xff).toByte
        frame(o + 10) = ((xingFrames >> 8) & 0xff).toByte
        frame(o + 11) = (xingFrames & 0xff).toByte
      }
      out.write(frame)
    }
    if (id3v1) {
      val tag = new Array[Byte](128)
      tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
      out.write(tag)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  /** One parsed payload's metadata row; integer-only, oracle-exact. */
  final case class MetaRow(
      doc_id: Long,
      version: String,
      layer: Int,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      total_samples: Long,
      duration_ms: Long,
      bitrate_min_kbps: Int,
      bitrate_max_kbps: Int,
      is_vbr: Boolean,
      xing_frames: Long,
      id3v2_bytes: Long,
      has_id3v1: Boolean,
      decode_ok: Boolean)

  /** Partition-parallel walk over a media table — scan-local, no
    * shuffle, bytes-linear; unparseable payloads land on the
    * decode_ok=false ladder like every other media path.
    */
  def parseMeta(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[MetaRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parse(bytes) match {
          case Some(m) => MetaRow(id, m.version, m.layer, m.sampleRate,
            m.channels, m.nFrames, m.totalSamples, m.durationMs,
            m.bitrateMinKbps, m.bitrateMaxKbps,
            m.bitrateMinKbps != m.bitrateMaxKbps, m.xingFrames,
            m.id3v2Bytes, m.hasId3v1, decode_ok = true)
          case None => MetaRow(id, "", -1, -1, -1, -1L, -1L, -1L, -1, -1,
            is_vbr = false, -1L, -1L, has_id3v1 = false, decode_ok = false)
        }
      })
  }
}
