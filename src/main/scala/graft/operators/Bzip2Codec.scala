package graft.operators

/** bzip2 decoder — pure Scala, from-spec: the classic Wikipedia-dump /
  * academic-corpus format. Implements the full stream grammar: "BZh"
  * header, per-block 48-bit magics, the Huffman stage (2–6 tables,
  * MTF-coded selectors switching every 50 symbols, delta-coded code
  * lengths), the symbol-map sparse alphabet, RUNA/RUNB bijective-base-2
  * zero runs through the MTF stage, the inverse Burrows–Wheeler
  * transform, the outer RLE, and BOTH CRC gates (per-block CRC and the
  * combined stream CRC, bzip2's MSB-first CRC-32 — verified, not
  * skipped). Multi-stream concatenations (pbzip2 output — what makes a
  * terabyte of .bz2 splittable) walk stream by stream.
  *
  * Subset, honestly: the deprecated `randomized` block bit (dropped by
  * bzip2 itself in 0.9.5, 1999; no modern encoder emits it) is
  * rejected as corrupt rather than de-randomized.
  *
  * Correctness anchor: commons-compress ships on the Spark classpath
  * with a real bzip2 encoder, so the spec round-trips this decoder
  * against reference output at every block size across entropy regimes.
  */
object Bzip2Codec {

  // ----------------------------------------------------- bzip2 CRC-32

  // MSB-first CRC-32 (poly 0x04c11db7) — bzip2's variant, NOT zlib's
  private val crcTable: Array[Int] = {
    val t = new Array[Int](256)
    var i = 0
    while (i < 256) {
      var c = i << 24
      var k = 0
      while (k < 8) { c = (c << 1) ^ (if (c < 0) 0x04c11db7 else 0); k += 1 }
      t(i) = c
      i += 1
    }
    t
  }

  private final class Crc {
    private var v = 0xffffffff
    def update(b: Int): Unit = v = (v << 8) ^ crcTable(((v >>> 24) ^ b) & 0xff)
    def value: Int = ~v
  }

  // ------------------------------------------------------ bit reading

  /** MSB-first bit reader over the whole payload (bzip2 blocks are NOT
    * byte-aligned; streams are).
    */
  private final class MsbBits(b: Array[Byte]) {
    var pos: Long = 0L // bit position
    def read(n: Int): Int = {
      var acc = 0
      var i = 0
      while (i < n) {
        val byteIdx = (pos >> 3).toInt
        require(byteIdx < b.length, "truncated bzip2 stream")
        acc = (acc << 1) | ((b(byteIdx) >> (7 - (pos & 7).toInt)) & 1)
        pos += 1
        i += 1
      }
      acc
    }
    def readLong(n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) { acc = (acc << 1) | read(1); i += 1 }
      acc
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
    def bytePos: Int = ((pos + 7) >> 3).toInt
  }

  // -------------------------------------------------- canonical huffman

  /** bzip2-style canonical decode tables from code lengths. */
  private final class HuffGroup(lengths: Array[Int]) {
    val minLen: Int = lengths.min
    val maxLen: Int = lengths.max
    // limit(len): largest code of that length; base(len): offset into perm
    val limit = new Array[Int](maxLen + 2)
    val base = new Array[Int](maxLen + 2)
    val perm = new Array[Int](lengths.length)
    locally {
      var pp = 0
      var len = minLen
      while (len <= maxLen) {
        var s = 0
        while (s < lengths.length) {
          if (lengths(s) == len) { perm(pp) = s; pp += 1 }
          s += 1
        }
        len += 1
      }
      var vec = 0
      len = minLen
      var permBase = 0
      while (len <= maxLen) {
        val n = lengths.count(_ == len)
        base(len) = vec - permBase
        permBase += n
        vec += n
        limit(len) = vec - 1
        vec <<= 1
        len += 1
      }
    }
    def decode(in: MsbBits): Int = {
      var len = minLen
      var code = in.read(minLen)
      while (len <= maxLen && code > limit(len)) {
        code = (code << 1) | in.read(1)
        len += 1
      }
      require(len <= maxLen, "corrupt huffman code")
      perm(code - base(len))
    }
  }

  // ----------------------------------------------------------- decode

  /** Decode ONE bzip2 stream at byte `pos`; Some((payload, nextBytePos))
    * or None. Both CRC gates verified.
    */
  def decodeStream(b: Array[Byte], posByte: Int): Option[(Array[Byte], Int)] = {
    try {
      if (b.length - posByte < 10) return None
      if (!(b(posByte) == 'B' && b(posByte + 1) == 'Z' && b(posByte + 2) == 'h')) return None
      val level = b(posByte + 3) - '0'
      if (level < 1 || level > 9) return None
      val maxBlock = level * 100000
      val in = new MsbBits(b)
      in.pos = (posByte + 4).toLong * 8
      val out = new java.io.ByteArrayOutputStream()
      var combinedCrc = 0
      var done = false
      while (!done) {
        val magic = in.readLong(48)
        if (magic == 0x177245385090L) {
          val streamCrc = in.read(32)
          if (streamCrc != combinedCrc) return None
          done = true
        } else {
          if (magic != 0x314159265359L) return None
          val blockCrc = in.read(32)
          if (in.read(1) != 0) return None // randomized: out of subset
          val origPtr = in.read(24)
          // sparse symbol map
          val used16 = in.read(16)
          val usedBytes = new Array[Boolean](256)
          var nUsed = 0
          var g = 0
          while (g < 16) {
            if ((used16 & (0x8000 >>> g)) != 0) {
              val bits = in.read(16)
              var j = 0
              while (j < 16) {
                if ((bits & (0x8000 >>> j)) != 0) { usedBytes(g * 16 + j) = true; nUsed += 1 }
                j += 1
              }
            }
            g += 1
          }
          require(nUsed > 0, "empty symbol map")
          val seqToByte = new Array[Int](nUsed)
          var k = 0
          var bb = 0
          while (bb < 256) { if (usedBytes(bb)) { seqToByte(k) = bb; k += 1 }; bb += 1 }
          val alphaSize = nUsed + 2
          val nGroups = in.read(3)
          require(nGroups >= 2 && nGroups <= 6, "bad group count")
          val nSelectors = in.read(15)
          require(nSelectors > 0, "no selectors")
          // selectors are MTF-coded unary
          val selMtf = Array.tabulate(nGroups)(identity)
          val selectors = new Array[Int](nSelectors)
          var s = 0
          while (s < nSelectors) {
            var j = 0
            while (in.read(1) == 1) { j += 1; require(j < nGroups, "selector overrun") }
            val v = selMtf(j)
            while (j > 0) { selMtf(j) = selMtf(j - 1); j -= 1 }
            selMtf(0) = v
            selectors(s) = v
            s += 1
          }
          // delta-coded lengths per group
          val groups = Array.tabulate(nGroups) { _ =>
            val lens = new Array[Int](alphaSize)
            var curr = in.read(5)
            var sym = 0
            while (sym < alphaSize) {
              var cont = true
              while (cont) {
                require(curr >= 1 && curr <= 23, "code length out of range")
                if (in.read(1) == 0) cont = false
                else if (in.read(1) == 0) curr += 1
                else curr -= 1
              }
              require(curr >= 1 && curr <= 23, "code length out of range")
              lens(sym) = curr
              sym += 1
            }
            new HuffGroup(lens)
          }
          // MTF + RUNA/RUNB symbol decode into the BWT block
          val block = new Array[Byte](maxBlock + 10)
          var blockLen = 0
          val mtf = seqToByte.clone()
          val eob = alphaSize - 1
          var selIdx = 0
          var groupCount = 0
          var table = groups(selectors(0))
          def nextSym(): Int = {
            if (groupCount == 50) {
              selIdx += 1
              require(selIdx < nSelectors, "selectors exhausted")
              table = groups(selectors(selIdx))
              groupCount = 0
            }
            groupCount += 1
            table.decode(in)
          }
          var sym = nextSym()
          while (sym != eob) {
            if (sym <= 1) {
              // zero run in bijective base 2
              var run = 0L
              var shift = 0
              while (sym <= 1) {
                run += (sym + 1).toLong << shift
                shift += 1
                require(shift < 40, "absurd zero run")
                sym = nextSym()
              }
              val byte0 = mtf(0).toByte
              require(blockLen + run <= maxBlock, "block overrun (run)")
              var r = 0L
              while (r < run) { block(blockLen) = byte0; blockLen += 1; r += 1 }
            } else {
              // MTF value sym-1
              val j = sym - 1
              require(j < nUsed, "MTF index out of range")
              val v = mtf(j)
              var t = j
              while (t > 0) { mtf(t) = mtf(t - 1); t -= 1 }
              mtf(0) = v
              require(blockLen < maxBlock, "block overrun")
              block(blockLen) = v.toByte
              blockLen += 1
              sym = nextSym()
            }
          }
          require(origPtr < blockLen, "origPtr beyond block")
          // inverse BWT: tt walk
          val cftab = new Array[Int](257)
          var i = 0
          while (i < blockLen) { cftab((block(i) & 0xff) + 1) += 1; i += 1 }
          i = 1
          while (i < 257) { cftab(i) += cftab(i - 1); i += 1 }
          val tt = new Array[Int](blockLen)
          i = 0
          while (i < blockLen) {
            val c = block(i) & 0xff
            tt(cftab(c)) = i
            cftab(c) += 1
            i += 1
          }
          // walk + outer RLE decode + block CRC
          val crc = new Crc()
          var p = tt(origPtr)
          var emitted = 0
          var runByte = -1
          var runLen = 0
          var expectCount = false
          while (emitted < blockLen) {
            val c = block(p) & 0xff
            p = tt(p)
            emitted += 1
            if (expectCount) {
              // c is the repeat count for the preceding 4-run
              var r = 0
              while (r < c) { out.write(runByte); crc.update(runByte); r += 1 }
              expectCount = false
              runByte = -1
              runLen = 0
            } else {
              out.write(c); crc.update(c)
              if (c == runByte) runLen += 1 else { runByte = c; runLen = 1 }
              if (runLen == 4) expectCount = true
            }
          }
          require(!expectCount, "block ends inside an RLE run")
          if (crc.value != blockCrc) return None
          combinedCrc = ((combinedCrc << 1) | (combinedCrc >>> 31)) ^ blockCrc
        }
      }
      in.alignByte()
      Some((out.toByteArray, in.bytePos))
    } catch { case _: Exception => None }
  }

  /** Strict whole-payload decode over concatenated streams (the pbzip2
    * shape); None on any corruption or trailing garbage.
    */
  def decode(b: Array[Byte]): Option[Array[Byte]] = {
    if (b == null || b.isEmpty) return None
    val out = new java.io.ByteArrayOutputStream()
    var pos = 0
    while (pos < b.length) {
      decodeStream(b, pos) match {
        case Some((data, next)) => out.write(data); pos = next
        case None => return None
      }
    }
    Some(out.toByteArray)
  }
}
