package graft.operators

/** LZ4 decoder — pure Scala, from-spec: the block format (the LZ4
  * sequence grammar: token nibbles, 255-extension lengths, 16-bit
  * offsets, overlap copies, the end-of-block literal run) and the
  * frame format v1.6 (magic, FLG/BD descriptor with its xxHash32
  * header checksum VERIFIED, independent and linked blocks, optional
  * per-block and whole-content xxHash32 checksums, content size
  * cross-check, skippable frames, frame concatenation). The JDK has no
  * LZ4; `.lz4` is the low-latency corpus interchange format (Hadoop
  * codecs, Kafka, fast dataset mirrors).
  *
  * Correctness anchor: lz4-java ships on the Spark classpath (shuffle
  * codec), so the spec round-trips this decoder against the REAL
  * compressor — both the fast and high-compression encoders, both
  * frame block modes — plus hand-built streams for the corners the
  * reference encoder never emits.
  *
  * Subset, honestly: dictionary-ID frames are rejected (corpus members
  * are self-contained), as are reserved version bits.
  */
object Lz4Codec {

  private val FrameMagic = 0x184d2204
  private val SkipMagicBase = 0x184d2a50

  // ------------------------------------------------------------ xxHash32

  private val X1 = 0x9e3779b1
  private val X2 = 0x85ebca77
  private val X3 = 0xc2b2ae3d
  private val X4 = 0x27d4eb2f
  private val X5 = 0x165667b1

  /** xxHash32 (public algorithm) — LZ4 frame header/block/content
    * checksums use it with seed 0.
    */
  def xxhash32(b: Array[Byte], off: Int, len: Int, seed: Int = 0): Int = {
    def le32(i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) | ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    var p = off
    val end = off + len
    var acc =
      if (len >= 16) {
        var a1 = seed + X1 + X2; var a2 = seed + X2; var a3 = seed; var a4 = seed - X1
        while (p + 16 <= end) {
          a1 = Integer.rotateLeft(a1 + le32(p) * X2, 13) * X1
          a2 = Integer.rotateLeft(a2 + le32(p + 4) * X2, 13) * X1
          a3 = Integer.rotateLeft(a3 + le32(p + 8) * X2, 13) * X1
          a4 = Integer.rotateLeft(a4 + le32(p + 12) * X2, 13) * X1
          p += 16
        }
        Integer.rotateLeft(a1, 1) + Integer.rotateLeft(a2, 7) +
          Integer.rotateLeft(a3, 12) + Integer.rotateLeft(a4, 18)
      } else seed + X5
    acc += len
    while (p + 4 <= end) {
      acc = Integer.rotateLeft(acc + le32(p) * X3, 17) * X4
      p += 4
    }
    while (p < end) {
      acc = Integer.rotateLeft(acc + (b(p) & 0xff) * X5, 11) * X1
      p += 1
    }
    acc ^= acc >>> 15; acc *= X2
    acc ^= acc >>> 13; acc *= X3
    acc ^= acc >>> 16
    acc
  }

  // ---------------------------------------------------------- block form

  /** Decode one LZ4 block into `out` starting at `outOff`, with match
    * copies allowed to reach back into `out` before `outOff` (linked-
    * block mode hands the previous 64 KiB window that way). Returns the
    * new output length or throws on corruption.
    */
  def decodeBlock(
      src: Array[Byte], from: Int, until: Int,
      out: Array[Byte], outOff: Int, outLimit: Int): Int = {
    var p = from
    var o = outOff
    while (p < until) {
      val token = src(p) & 0xff; p += 1
      // literal run
      var litLen = token >> 4
      if (litLen == 15) {
        var x = 0
        do {
          require(p < until, "truncated literal length")
          x = src(p) & 0xff; p += 1; litLen += x
        } while (x == 255)
      }
      require(p + litLen <= until, "literal run overruns block")
      require(o + litLen <= outLimit, "literal run overruns output")
      System.arraycopy(src, p, out, o, litLen)
      p += litLen; o += litLen
      if (p == until) return o // last sequence is literals-only by spec
      require(p + 2 <= until, "truncated match offset")
      val offset = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8); p += 2
      require(offset > 0, "zero match offset")
      var matchLen = (token & 0xf) + 4
      if ((token & 0xf) == 15) {
        var x = 0
        do {
          require(p < until, "truncated match length")
          x = src(p) & 0xff; p += 1; matchLen += x
        } while (x == 255)
      }
      require(o - offset >= 0, s"match offset $offset beyond window")
      require(o + matchLen <= outLimit, "match overruns output")
      var i = 0
      while (i < matchLen) { out(o + i) = out(o + i - offset); i += 1 }
      o += matchLen
    }
    o
  }

  // ---------------------------------------------------------- frame form

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var k = 0
    while (k < n) { v |= (b(off + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  /** Decode ONE frame at `pos`: Some((payload, nextPos)) or None on any
    * corruption (header checksum, block checksums, content checksum and
    * content size are all VERIFIED when present). Skippable frames
    * return Some((empty, nextPos)).
    */
  def decodeFrame(b: Array[Byte], pos: Int): Option[(Array[Byte], Int)] = {
    try {
      if (b.length - pos < 4) return None
      val magic = le(b, pos, 4).toInt
      if ((magic & 0xfffffff0) == SkipMagicBase) {
        if (b.length - pos < 8) return None
        val size = le(b, pos + 4, 4)
        val next = pos + 8 + size
        if (next > b.length) return None
        return Some((Array.emptyByteArray, next.toInt))
      }
      if (magic != FrameMagic) return None
      var p = pos + 4
      val flg = b(p) & 0xff
      val bd = b(p + 1) & 0xff
      if ((flg >> 6) != 1) return None // version must be 01
      val blockIndep = (flg & 0x20) != 0
      val blockChecksum = (flg & 0x10) != 0
      val hasContentSize = (flg & 0x08) != 0
      val contentChecksum = (flg & 0x04) != 0
      if ((flg & 0x02) != 0) return None // reserved bit
      if ((flg & 0x01) != 0) return None // dictionary ID out of subset
      val bmax = (bd >> 4) & 7
      if (bmax < 4 || bmax > 7 || (bd & 0x8f) != 0) return None
      val blockMax = 1 << (8 + 2 * bmax) // 64 KiB .. 4 MiB
      var headerLen = 2
      var contentSize = -1L
      if (hasContentSize) { contentSize = le(b, p + 2, 8); headerLen += 8 }
      val hc = b(p + headerLen) & 0xff
      if (((xxhash32(b, p, headerLen) >> 8) & 0xff) != hc) return None
      p += headerLen + 1
      val out = new java.io.ByteArrayOutputStream()
      var window = new Array[Byte](0) // linked-block history (<= 64 KiB)
      var done = false
      while (!done) {
        if (b.length - p < 4) return None
        val bsizeRaw = le(b, p, 4).toInt; p += 4
        if (bsizeRaw == 0) done = true
        else {
          val uncompressed = (bsizeRaw & 0x80000000) != 0
          val bsize = bsizeRaw & 0x7fffffff
          if (bsize > blockMax || p + bsize > b.length) return None
          if (blockChecksum) {
            if (p + bsize + 4 > b.length) return None
            if (xxhash32(b, p, bsize) != le(b, p + bsize, 4).toInt) return None
          }
          val data =
            if (uncompressed) java.util.Arrays.copyOfRange(b, p, p + bsize)
            else {
              // decode with the linked window prefixed when dependent
              val buf = new Array[Byte](window.length + blockMax)
              System.arraycopy(window, 0, buf, 0, window.length)
              val end = decodeBlock(b, p, p + bsize, buf, window.length, buf.length)
              java.util.Arrays.copyOfRange(buf, window.length, end)
            }
          out.write(data)
          if (!blockIndep) {
            // maintain the trailing 64 KiB as the next block's window
            val keep = math.min(65536, window.length + data.length)
            val w = new Array[Byte](keep)
            val fromData = math.min(data.length, keep)
            val fromWin = keep - fromData
            System.arraycopy(window, window.length - fromWin, w, 0, fromWin)
            System.arraycopy(data, data.length - fromData, w, fromWin, fromData)
            window = w
          }
          p += bsize + (if (blockChecksum) 4 else 0)
        }
      }
      val payload = out.toByteArray
      if (contentSize >= 0 && payload.length.toLong != contentSize) return None
      if (contentChecksum) {
        if (p + 4 > b.length) return None
        if (xxhash32(payload, 0, payload.length) != le(b, p, 4).toInt) return None
        p += 4
      }
      Some((payload, p))
    } catch { case _: Exception => None }
  }

  /** Strict whole-payload decode: concatenated frames, every one must
    * verify; None on any corruption or trailing garbage.
    */
  def decode(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.isEmpty) return None
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < b.length) {
      decodeFrame(b, pos) match {
        case Some((data, next)) => out.write(data); pos = next
        case None => return None
      }
    }
    Some(out.toByteArray)
  }
}
