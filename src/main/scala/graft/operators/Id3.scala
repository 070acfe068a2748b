package graft.operators

/** ID3v2.3/2.4 tag parsing (the de-facto id3.org informal standard) —
  * the metadata companion of the [[Mp3Codec]] container walk: an audio
  * corpus's title/artist/album/track/year live in the tag prefix the
  * frame walk skips. Pure JVM, headers-and-text-frames only.
  *
  * Grammar: `ID3` + version(2) + flags(1) + syncsafe size(4); v2.3
  * extended header skipped via its size field; frames = id(4) +
  * size(4 — PLAIN big-endian in v2.3, SYNCSAFE in v2.4, the classic
  * interop trap) + flags(2) + data; text frames (`T...`) carry an
  * encoding byte (0 Latin-1, 1 UTF-16 with BOM, 2 UTF-16BE, 3 UTF-8)
  * and NUL-terminated text; padding (a zero id byte) ends the frame
  * walk. ID3v1: the fixed 128-byte `TAG` tail with space/NUL-padded
  * 30-char fields.
  *
  * Subset, honestly: unsynchronised tags (header flag 0x80) and
  * v2.2 three-byte layouts return None — both are practically extinct
  * in post-2005 corpora; compressed/encrypted frames are skipped by
  * their declared size.
  *
  * Scale shape: a per-row prefix parse inside the same
  * `mapPartitions` walk as the container codecs — bytes-linear,
  * scan-local, zero shuffle.
  */
object Id3 {

  final case class Tag(
      version: String, // "2.3" | "2.4"
      title: String, // "" when absent
      artist: String,
      album: String,
      track: String,
      year: String, // TYER (2.3) or TDRC (2.4)
      nFrames: Int)

  private def syncsafe(b: Array[Byte], i: Int): Int =
    ((b(i) & 0x7f) << 21) | ((b(i + 1) & 0x7f) << 14) |
      ((b(i + 2) & 0x7f) << 7) | (b(i + 3) & 0x7f)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def decodeText(b: Array[Byte], off: Int, len: Int): String = {
    if (len <= 0) return ""
    val enc = b(off) & 0xff
    val cs = enc match {
      case 0 => "ISO-8859-1"
      case 1 => "UTF-16" // BOM-led
      case 2 => "UTF-16BE"
      case 3 => "UTF-8"
      case _ => return ""
    }
    val s = new String(b, off + 1, len - 1, cs)
    val cut = s.indexOf(0.toChar)
    if (cut >= 0) s.substring(0, cut) else s
  }

  /** Parse the ID3v2 tag at the head of `bytes`; None when absent or
    * out of subset (v2.2, unsynchronised).
    */
  def parse(bytes: Array[Byte]): Option[Tag] = {
    try {
      if (bytes == null || bytes.length < 10) return None
      if (!(bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3')) return None
      val major = bytes(3) & 0xff
      if (major != 3 && major != 4) return None
      val flags = bytes(5) & 0xff
      if ((flags & 0x80) != 0) return None // unsynchronised: out of subset
      val size = syncsafe(bytes, 6)
      val end = math.min(10 + size, bytes.length)
      var pos = 10
      if ((flags & 0x40) != 0) { // extended header
        if (pos + 4 > end) return None
        val ext = if (major == 4) syncsafe(bytes, pos) else be32(bytes, pos)
        pos += (if (major == 4) ext else ext + 4)
      }
      var title = ""; var artist = ""; var album = ""
      var track = ""; var year = ""
      var n = 0
      var go = true
      while (go && pos + 10 <= end) {
        if (bytes(pos) == 0) go = false // padding
        else {
          val id = new String(bytes, pos, 4, "ISO-8859-1")
          val fsize = if (major == 4) syncsafe(bytes, pos + 4) else be32(bytes, pos + 4)
          if (fsize < 0 || pos + 10 + fsize > end) return None
          n += 1
          if (id.startsWith("T")) {
            val text = decodeText(bytes, pos + 10, fsize)
            id match {
              case "TIT2" => title = text
              case "TPE1" => artist = text
              case "TALB" => album = text
              case "TRCK" => track = text
              case "TYER" | "TDRC" => year = text
              case _ => ()
            }
          }
          pos += 10 + fsize
        }
      }
      Some(Tag(s"2.$major", title, artist, album, track, year, n))
    } catch { case _: Exception => None }
  }

  /** ID3v1 tail fields (title, artist, album, year), when present. */
  def parseV1(bytes: Array[Byte]): Option[(String, String, String, String)] = {
    if (bytes == null || bytes.length < 128) return None
    val off = bytes.length - 128
    if (!(bytes(off) == 'T' && bytes(off + 1) == 'A' && bytes(off + 2) == 'G'))
      return None
    def field(o: Int, len: Int): String =
      new String(bytes, off + o, len, "ISO-8859-1")
        .takeWhile(_ != 0.toChar).replaceAll(" +$", "")
    Some((field(3, 30), field(33, 30), field(63, 30), field(93, 4)))
  }

  // ------------------------------------------------------------ fixtures

  /** Serialize text frames as an ID3v2.<major> tag (major 3 or 4;
    * frame sizes plain/syncsafe accordingly). `encoding` picks the
    * text-frame encoding byte for every frame.
    */
  def fixture(
      major: Int,
      frames: Seq[(String, String)],
      encoding: Int = 0,
      padding: Int = 16): Array[Byte] = {
    require(major == 3 || major == 4, "v2.3 or v2.4 only")
    val body = new java.io.ByteArrayOutputStream()
    for ((id, text) <- frames) {
      val data = encoding match {
        case 0 => text.getBytes("ISO-8859-1")
        case 1 => text.getBytes("UTF-16") // writes the BOM
        case 2 => text.getBytes("UTF-16BE")
        case _ => text.getBytes("UTF-8")
      }
      body.write(id.getBytes("ISO-8859-1"))
      val sz = data.length + 1
      if (major == 4)
        body.write(Array(((sz >> 21) & 0x7f).toByte, ((sz >> 14) & 0x7f).toByte,
          ((sz >> 7) & 0x7f).toByte, (sz & 0x7f).toByte))
      else
        body.write(Array(((sz >> 24) & 0xff).toByte, ((sz >> 16) & 0xff).toByte,
          ((sz >> 8) & 0xff).toByte, (sz & 0xff).toByte))
      body.write(0); body.write(0) // frame flags
      body.write(encoding)
      body.write(data)
    }
    (0 until padding).foreach(_ => body.write(0))
    val b = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('I', 'D', '3', major.toByte, 0, 0))
    out.write(Array(((b.length >> 21) & 0x7f).toByte,
      ((b.length >> 14) & 0x7f).toByte,
      ((b.length >> 7) & 0x7f).toByte, (b.length & 0x7f).toByte))
    out.write(b)
    out.toByteArray
  }

  // ------------------------------------------------------------- Spark

  final case class TagRow(
      doc_id: Long,
      has_tag: Boolean,
      version: String,
      title: String,
      artist: String,
      album: String,
      track: String,
      year: String,
      n_frames: Int)

  /** Partition-parallel tag walk over (doc_id, payload). */
  def parseTags(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[TagRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parse(bytes) match {
          case Some(t) => TagRow(id, has_tag = true, t.version, t.title,
            t.artist, t.album, t.track, t.year, t.nFrames)
          case None => TagRow(id, has_tag = false, "", "", "", "", "", "", 0)
        }
      })
  }
}
