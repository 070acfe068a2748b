package graft.operators

/** Pure-JVM Ogg container walk (RFC 3533 page grammar + the Vorbis-I /
  * RFC 7845 Opus identification headers) — the third leg of the
  * container-metadata family ([[Mp4Codec]], [[Mp3Codec]]): everything
  * a corpus pipeline needs from an .ogg/.opus payload (codec identity,
  * channel count, rates, EXACT sample duration from granule positions,
  * page accounting, continuation/EOS integrity) read from page headers
  * and the first identification packet, with ZERO audio decode — the
  * Vorbis MDCT / Opus SILK+CELT bitstreams stay behind the documented
  * [[Multimodal.decodeStub]] seam.
  *
  * Subset, honestly: single-logical-stream files (one serial number —
  * the overwhelmingly common shape; grouped/chained streams return
  * None rather than mis-attribute granules), codecs Vorbis and Opus
  * (identification packet required on the first page), CRC field read
  * but not verified (RFC 3533's CRC-32 has a non-standard generator;
  * structural validation — capture pattern, version 0, header sizes,
  * segment-table bounds, strictly-increasing page sequence — is what
  * catches truncation and splice corruption, and the spec locks those
  * paths). Duration: Vorbis granules ARE pcm sample positions; Opus
  * granules are 48 kHz ticks MINUS the ID header's pre-skip (RFC 7845
  * §4.2), both exact integers.
  */
object OggCodec {

  final case class Meta(
      codec: String, // "vorbis" | "opus"
      channels: Int,
      sampleRate: Int, // Vorbis: audio rate; Opus: input rate hint (48k clock)
      preSkip: Int, // Opus only, 0 for Vorbis
      nPages: Long,
      lastGranule: Long, // final page's granule position
      totalSamples: Long, // duration in codec clock ticks (granule − preSkip)
      durationMs: Long)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le32(b: Array[Byte], i: Int): Long =
    (u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3).toLong << 24)) & 0xFFFFFFFFL
  private def le64(b: Array[Byte], i: Int): Long =
    (0 until 8).map(k => u8(b, i + k).toLong << (8 * k)).reduce(_ | _)

  def parse(bytes: Array[Byte]): Option[Meta] = {
    try parseOrThrow(bytes) catch { case _: Exception => None }
  }

  private def parseOrThrow(bytes: Array[Byte]): Option[Meta] = {
    if (bytes == null || bytes.length < 28) return None
    var pos = 0
    var serial = -1L
    var expectSeq = 0L
    var nPages = 0L
    var lastGranule = -1L
    var sawBos = false; var sawEos = false
    var firstPacket: Array[Byte] = null
    while (pos < bytes.length) {
      if (sawEos) return None // data after the EOS page
      if (bytes.length - pos < 27) return None
      if (!(bytes(pos) == 'O' && bytes(pos + 1) == 'g' &&
          bytes(pos + 2) == 'g' && bytes(pos + 3) == 'S')) return None
      if (u8(bytes, pos + 4) != 0) return None // stream structure version
      val flags = u8(bytes, pos + 5)
      val granule = le64(bytes, pos + 6)
      val ser = le32(bytes, pos + 14)
      val seq = le32(bytes, pos + 18)
      val nSegs = u8(bytes, pos + 26)
      if (bytes.length - pos < 27 + nSegs) return None
      val segs = (0 until nSegs).map(k => u8(bytes, pos + 27 + k))
      val bodyLen = segs.sum
      val body = pos + 27 + nSegs
      if (bytes.length - body < bodyLen) return None
      if (nPages == 0L) {
        if ((flags & 2) == 0) return None // first page must be BOS
        serial = ser
        sawBos = true
        // the identification packet must fit the first page (both specs)
        firstPacket = java.util.Arrays.copyOfRange(bytes, body, body + bodyLen)
      } else {
        if (ser != serial) return None // grouped/chained: out of subset
        if ((flags & 2) != 0) return None // second BOS in one stream
      }
      if (seq != expectSeq) return None // lost/duplicated page
      expectSeq += 1
      if ((flags & 4) != 0) sawEos = true
      // granule −1 (0xFFFFFFFFFFFFFFFF) marks a no-packet-ends page; any
      // other value is the position after the last finished packet
      if (granule != -1L) lastGranule = granule
      nPages += 1
      pos = body + bodyLen
    }
    if (!sawBos || !sawEos || lastGranule < 0) return None

    // identification packet → codec identity + parameters
    val p = firstPacket
    if (p.length >= 19 && p(0) == 0x01.toByte && p(1) == 'v' && p(2) == 'o' &&
      p(3) == 'r' && p(4) == 'b' && p(5) == 'i' && p(6) == 's') {
      if (le32(p, 7) != 0L) return None // vorbis_version
      val ch = u8(p, 11)
      val rate = le32(p, 12).toInt
      if (ch < 1 || rate <= 0) return None
      val samples = lastGranule
      Some(Meta("vorbis", ch, rate, 0, nPages, lastGranule, samples,
        samples * 1000L / rate))
    } else if (p.length >= 19 && p.startsWith("OpusHead".getBytes("US-ASCII"))) {
      if (u8(p, 8) != 1) return None // version
      val ch = u8(p, 9)
      val preSkip = u8(p, 10) | (u8(p, 11) << 8)
      val inputRate = le32(p, 12).toInt
      if (ch < 1) return None
      // Opus granules tick at 48 kHz regardless of the input-rate hint
      val samples = math.max(0L, lastGranule - preSkip)
      Some(Meta("opus", ch, inputRate, preSkip, nPages, lastGranule,
        samples, samples * 1000L / 48000L))
    } else None
  }

  // ------------------------------------------------------------- fixtures

  /** Fixture writer: a valid single-stream Ogg with a real ID packet on
    * the BOS page and `nPages` deterministic-payload data pages, the
    * last flagged EOS with `lastGranule`. Intermediate pages carry
    * granules spaced evenly (and one −1 no-packet-ends page when
    * `plantNoGranule`); CRC bytes are zeroed (read, not verified — see
    * object scaladoc). Not an encoder — a container fixture.
    */
  def fixture(
      codec: String,
      channels: Int,
      sampleRate: Int,
      preSkip: Int,
      nDataPages: Int,
      lastGranule: Long,
      plantNoGranule: Boolean = false): Array[Byte] = {
    require(nDataPages >= 1, "need at least one data page")
    val out = new java.io.ByteArrayOutputStream()
    def page(flags: Int, granule: Long, seq: Long, body: Array[Byte]): Unit = {
      require(body.length <= 255 * 255, "fixture page too large")
      val nSegs = body.length / 255 + 1
      val h = new Array[Byte](27 + nSegs)
      h(0) = 'O'; h(1) = 'g'; h(2) = 'g'; h(3) = 'S'
      h(4) = 0; h(5) = flags.toByte
      (0 until 8).foreach(k => h(6 + k) = ((granule >> (8 * k)) & 0xff).toByte)
      val serial = 0x47524654L // "GRFT"
      (0 until 4).foreach(k => h(14 + k) = ((serial >> (8 * k)) & 0xff).toByte)
      (0 until 4).foreach(k => h(18 + k) = ((seq >> (8 * k)) & 0xff).toByte)
      // CRC (22..25) left zero
      h(26) = nSegs.toByte
      var rem = body.length
      (0 until nSegs).foreach { k =>
        h(27 + k) = math.min(rem, 255).toByte
        rem -= math.min(rem, 255)
      }
      out.write(h); out.write(body)
    }
    val id: Array[Byte] = codec match {
      case "vorbis" =>
        val p = new Array[Byte](30)
        p(0) = 0x01
        "vorbis".getBytes("US-ASCII").copyToArray(p, 1)
        // version 0 at 7..10; channels at 11; rate LE at 12..15
        p(11) = channels.toByte
        (0 until 4).foreach(k => p(12 + k) = ((sampleRate >> (8 * k)) & 0xff).toByte)
        p(29) = 0x01 // framing bit
        p
      case "opus" =>
        val p = new Array[Byte](19)
        "OpusHead".getBytes("US-ASCII").copyToArray(p, 0)
        p(8) = 1 // version
        p(9) = channels.toByte
        p(10) = (preSkip & 0xff).toByte; p(11) = ((preSkip >> 8) & 0xff).toByte
        (0 until 4).foreach(k => p(12 + k) = ((sampleRate >> (8 * k)) & 0xff).toByte)
        p
      case other => throw new IllegalArgumentException(s"codec $other")
    }
    page(flags = 2, granule = 0L, seq = 0L, id) // BOS
    (1 to nDataPages).foreach { i =>
      val eos = i == nDataPages
      val granule =
        if (plantNoGranule && i == 1 && nDataPages > 1) -1L
        else lastGranule * i / nDataPages
      val body = Array.tabulate(40 + 10 * i)(j => ((i * 31 + j * 7) % 251).toByte)
      page(flags = if (eos) 4 else 0, granule, seq = i.toLong, body)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class MetaRow(
      doc_id: Long,
      codec: String,
      channels: Int,
      sample_rate: Int,
      pre_skip: Int,
      n_pages: Long,
      last_granule: Long,
      total_samples: Long,
      duration_ms: Long,
      decode_ok: Boolean)

  /** Partition-parallel walk — scan-local, bytes-linear, the
    * decode_ok=false ladder for unparseable payloads.
    */
  def parseMeta(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[MetaRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parse(bytes) match {
          case Some(m) => MetaRow(id, m.codec, m.channels, m.sampleRate,
            m.preSkip, m.nPages, m.lastGranule, m.totalSamples,
            m.durationMs, decode_ok = true)
          case None => MetaRow(id, "", -1, -1, -1, -1L, -1L, -1L, -1L,
            decode_ok = false)
        }
      })
  }
}
