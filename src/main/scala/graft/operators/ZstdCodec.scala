package graft.operators

/** Zstandard (RFC 8878) decoder — pure Scala, from-spec: the modern
  * corpus-compression front door (CommonCrawl-adjacent corpora, HF
  * datasets, and most 2020s text dumps ship `.zst`). The JDK has no
  * zstd support; this implements the COMPLETE non-dictionary format:
  * frame + block grammar, raw/RLE/compressed blocks, Huffman-coded
  * literals (direct AND FSE-compressed weight descriptions, one- and
  * four-stream variants, treeless repeats), FSE sequence tables in all
  * four modes (predefined distributions, RLE, FSE-compressed
  * descriptions, repeat), the three-state interleaved sequence
  * bitstream with repcode resolution, overlapping match copies, multi-
  * frame concatenation, skippable frames, and xxHash64 content
  * checksums (verified, not skipped).
  *
  * Subset, honestly: dictionary frames (non-zero Dictionary_ID) are
  * rejected as corrupt — corpus members are self-contained frames —
  * and window sizes above 1 GiB are refused as a corrupt-input
  * allocation guard (the reference decoder's own default limit).
  *
  * Correctness anchor: unlike the other from-spec codecs in this repo
  * (FLAC, VP8L, PDF) there is a REAL reference encoder on the Spark
  * classpath (zstd-jni, which Spark bundles for parquet codecs), so
  * the spec round-trips this decoder against actual zstd output across
  * levels, sizes, and entropy regimes — every format feature exercised
  * by the genuine article, not by a self-written encoder.
  *
  * Reference behavior being re-expressed: hyperion's ingest accepts
  * compressed payload bodies opaquely (src/indexer/workers/deserializer.ts
  * hands bytes through); the LLM-pipeline front doors (Warc/ZipWalk/Tar)
  * here extend that to the container formats a 100 TB corpus arrives in.
  */
object ZstdCodec {

  private val FrameMagic = 0xfd2fb528
  private val SkipMagicBase = 0x184d2a50

  // ------------------------------------------------------------ bit I/O

  /** Backward bitstream (RFC 8878 §4.1): values are written LSB-first
    * and read from the end, after a single sentinel 1-bit of padding in
    * the last byte. `read(n)` consumes the next n bits (the value whose
    * MSB is the first bit encountered reading backward — bit-for-bit
    * the reference BIT_readBits); `peek` is the non-consuming variant
    * that zero-fills past the start, exactly the reference's lookBits
    * semantics for end-of-stream Huffman/FSE flushes.
    */
  private final class BackBits(b: Array[Byte], from: Int, until: Int) {
    var pos: Long = {
      require(until > from, "empty bitstream")
      val last = b(until - 1) & 0xff
      require(last != 0, "corrupt padding byte")
      (until - 1 - from).toLong * 8 + (31 - Integer.numberOfLeadingZeros(last))
    }
    // word-assembled bit gather (n <= 56); bits below position 0 read
    // as zero — the reference lookBits zero-fill for tail flushes
    private def gather(at: Long, n: Int): Long = {
      if (n == 0) return 0L
      val firstByte = (at >> 3).toInt // arithmetic shift: negative at floors
      val lastByte = ((at + n - 1) >> 3).toInt
      var acc = 0L
      var k = math.max(firstByte, 0)
      while (k <= lastByte) {
        acc |= (b(from + k) & 0xffL) << ((k - firstByte) << 3)
        k += 1
      }
      val shift = (at - firstByte.toLong * 8).toInt // 0..7
      (acc >>> shift) & ((1L << n) - 1)
    }
    def read(n: Int): Int = { pos -= n; gather(pos, n).toInt }
    def readLong(n: Int): Long = { pos -= n; gather(pos, n) }
    def peek(n: Int): Int = gather(pos - n, n).toInt
    def skip(n: Int): Unit = pos -= n
    def overflowed: Boolean = pos < 0
    def exhausted: Boolean = pos == 0
  }

  /** Forward bitstream (FSE table descriptions only, §4.1.1): bits are
    * consumed LSB-first from bytes in order.
    */
  private final class FwdBits(b: Array[Byte], from: Int, until: Int) {
    private var bit = 0L
    def read(n: Int): Int = {
      var acc = 0
      var i = 0
      while (i < n) {
        val bp = bit + i
        val byteIdx = from + (bp >> 3).toInt
        require(byteIdx < until, "FSE table description overruns its stream")
        acc |= ((b(byteIdx) >> (bp & 7).toInt) & 1) << i
        i += 1
      }
      bit += n
      acc
    }
    def peek(n: Int): Int = { val save = bit; val v = read(n); bit = save; v }
    def bytesConsumed: Int = ((bit + 7) >> 3).toInt
  }

  // ------------------------------------------------------------ FSE

  /** One FSE decode table: state -> (symbol, nbBits, newStateBase). */
  private final class FseTable(
      val accuracyLog: Int,
      val symbol: Array[Int],
      val nbBits: Array[Int],
      val base: Array[Int])

  /** Build the decode table from normalized counts (§4.1.1): -1 counts
    * get one high cell each at accuracyLog bits; the rest spread with
    * the (size/2 + size/8 + 3) step skipping the reserved high cells;
    * per-cell nbBits/base derive from each symbol's occurrence index.
    */
  private def buildFseTable(counts: Array[Int], accuracyLog: Int): FseTable = {
    val size = 1 << accuracyLog
    val symbol = new Array[Int](size)
    var highThreshold = size - 1
    val symbolNext = new Array[Int](counts.length)
    var s = 0
    while (s < counts.length) {
      if (counts(s) == -1) {
        symbol(highThreshold) = s; highThreshold -= 1; symbolNext(s) = 1
      } else symbolNext(s) = counts(s)
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var position = 0
    s = 0
    while (s < counts.length) {
      var i = 0
      while (i < counts(s)) {
        symbol(position) = s
        do { position = (position + step) & mask } while (position > highThreshold)
        i += 1
      }
      s += 1
    }
    require(position == 0, "corrupt FSE distribution (spread did not close)")
    val nbBits = new Array[Int](size)
    val base = new Array[Int](size)
    var cell = 0
    while (cell < size) {
      val sym = symbol(cell)
      val next = symbolNext(sym); symbolNext(sym) += 1
      val nb = accuracyLog - (31 - Integer.numberOfLeadingZeros(next))
      nbBits(cell) = nb
      base(cell) = (next << nb) - size
      cell += 1
    }
    new FseTable(accuracyLog, symbol, nbBits, base)
  }

  /** A one-state RLE "table": every state emits `sym` for zero bits. */
  private def rleTable(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  /** Parse an FSE table description (§4.1.1, forward bitstream) into
    * normalized counts; returns (table, bytesConsumed).
    */
  private def readFseTable(
      b: Array[Byte], from: Int, until: Int,
      maxAccuracy: Int, maxSymbol: Int): (FseTable, Int) = {
    val in = new FwdBits(b, from, until)
    val accuracyLog = in.read(4) + 5
    require(accuracyLog <= maxAccuracy, s"FSE accuracy $accuracyLog over max $maxAccuracy")
    val size = 1 << accuracyLog
    val counts = new Array[Int](maxSymbol + 1)
    var remaining = size + 1
    var threshold = size
    var nbBits = accuracyLog + 1
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        while (in.peek(2) == 3) { in.read(2); charnum += 3; require(charnum <= maxSymbol + 3, "repeat-zero overrun") }
        charnum += in.read(2)
        previous0 = false
      }
      require(charnum <= maxSymbol, "FSE symbol overrun")
      val max = (2 * threshold - 1) - remaining
      var count =
        if ((in.peek(nbBits - 1) & (threshold - 1)) < max) in.read(nbBits - 1)
        else {
          val v = in.read(nbBits)
          if (v >= threshold) v - max else v
        }
      count -= 1 // shift: stored value 0 means "less than one" (-1)
      remaining -= (if (count < 0) -count else count)
      counts(charnum) = count
      charnum += 1
      previous0 = count == 0
      while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
    }
    require(remaining == 1, "corrupt FSE normalized counts")
    (buildFseTable(counts, accuracyLog), in.bytesConsumed)
  }

  // -------------------------------------------------- predefined tables

  // RFC 8878 §3.1.1.3.2.2 — the default distributions.
  private val LlDefault = Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
    2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, -1, -1, -1, -1, -1)
  private lazy val LlPredefined = buildFseTable(LlDefault, 6)
  private lazy val MlPredefined = buildFseTable(MlDefault, 6)
  private lazy val OfPredefined = buildFseTable(OfDefault, 5)

  // Literals-length and match-length code baselines + extra bits
  // (§3.1.1.3.1.1 / §3.1.1.3.1.2).
  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 18, 20,
    22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
    16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
    3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 37, 39,
    41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051, 4099,
    8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7,
    8, 9, 10, 11, 12, 13, 14, 15, 16)

  // ------------------------------------------------------------ Huffman

  /** One Huffman decode table: index by the next `tableLog` bits of the
    * backward stream; each cell holds (symbol, code length).
    */
  private final class HuffTable(val tableLog: Int, val sym: Array[Int], val len: Array[Int])

  /** Build the canonical table from weights (§4.2.1): the last weight
    * is implied (it completes the sum to a power of two); symbols of
    * weight w occupy 2^(w-1) consecutive cells, lowest weights first,
    * symbols in natural order within a weight.
    */
  private def buildHuffTable(weights: Array[Int]): HuffTable = {
    var total = 0L
    var maxW = 0
    weights.foreach { w =>
      require(w >= 0 && w <= 11, "huffman weight out of range")
      if (w > 0) { total += 1L << (w - 1); maxW = math.max(maxW, w) }
    }
    require(total > 0, "empty huffman weights")
    val tableLog = 64 - java.lang.Long.numberOfLeadingZeros(total) // highestBit(total)+1
    require(tableLog <= 11, "huffman table log over 11")
    val rest = (1L << tableLog) - total
    require(rest > 0 && (rest & (rest - 1)) == 0, "huffman weights do not complete a power of two")
    val lastW = (63 - java.lang.Long.numberOfLeadingZeros(rest)).toInt + 1
    val all = weights :+ lastW
    val size = 1 << tableLog
    val sym = new Array[Int](size)
    val len = new Array[Int](size)
    // start offset per weight: weight 1 first, each rank 2^(w-1) wide
    val rankCount = new Array[Int](13)
    all.foreach(w => if (w > 0) rankCount(w) += 1)
    val rankStart = new Array[Int](13)
    var next = 0
    var w = 1
    while (w <= 12) { rankStart(w) = next; next += rankCount(w) << (w - 1); w += 1 }
    require(next == size, "huffman rank layout mismatch")
    var s = 0
    while (s < all.length) {
      val wt = all(s)
      if (wt > 0) {
        val n = 1 << (wt - 1)
        val start = rankStart(wt)
        var i = 0
        while (i < n) { sym(start + i) = s; len(start + i) = tableLog.toInt + 1 - wt; i += 1 }
        rankStart(wt) += n
      }
      s += 1
    }
    new HuffTable(tableLog.toInt, sym, len)
  }

  /** Read a Huffman tree description at `from` (§4.2.1): direct 4-bit
    * weights when the header byte is >= 128, otherwise an FSE-compressed
    * weight stream decoded with TWO interleaved states. Returns
    * (table, bytesConsumed).
    */
  private def readHuffTable(b: Array[Byte], from: Int, until: Int): (HuffTable, Int) = {
    require(from < until, "missing huffman description")
    val header = b(from) & 0xff
    if (header >= 128) {
      val n = header - 127
      val bytes = (n + 1) / 2
      require(from + 1 + bytes <= until, "truncated direct weights")
      val weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val byte = b(from + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) byte >> 4 else byte & 0xf
        i += 1
      }
      (buildHuffTable(weights), 1 + bytes)
    } else {
      val csize = header
      require(from + 1 + csize <= until, "truncated FSE weight stream")
      val (table, used) = readFseTable(b, from + 1, from + 1 + csize, 6, 255)
      val bits = new BackBits(b, from + 1 + used, from + 1 + csize)
      // two interleaved states (§4.2.1.3); the stream end flushes one
      // final symbol from each state, reference loop shape
      var st1 = bits.read(table.accuracyLog)
      var st2 = bits.read(table.accuracyLog)
      require(!bits.overflowed, "weight stream shorter than its states")
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var done = false
      while (!done) {
        require(out.length < 255, "more than 254 decoded weights")
        out += table.symbol(st1)
        st1 = table.base(st1) + bits.read(table.nbBits(st1))
        if (bits.overflowed) { out += table.symbol(st2); done = true }
        else {
          require(out.length < 255, "more than 254 decoded weights")
          out += table.symbol(st2)
          st2 = table.base(st2) + bits.read(table.nbBits(st2))
          if (bits.overflowed) { out += table.symbol(st1); done = true }
        }
      }
      (buildHuffTable(out.toArray), 1 + csize)
    }
  }

  /** Decode `count` literals from one backward Huffman stream. */
  private def huffDecodeStream(
      table: HuffTable, b: Array[Byte], from: Int, until: Int,
      out: Array[Byte], outOff: Int, count: Int): Unit = {
    val bits = new BackBits(b, from, until)
    var i = 0
    while (i < count) {
      val idx = bits.peek(table.tableLog)
      out(outOff + i) = table.sym(idx).toByte
      bits.skip(table.len(idx))
      i += 1
    }
    require(bits.exhausted, "huffman stream not fully consumed")
  }

  // ------------------------------------------------------------ xxHash64

  private val P1 = 0x9e3779b185ebca87L
  private val P2 = 0xc2b2ae3d27d4eb4fL
  private val P3 = 0x165667b19e3779f9L
  private val P4 = 0x85ebca77c2b2ae63L
  private val P5 = 0x27d4eb2f165667c5L

  /** xxHash64 over a byte range — the frame content checksum (§3.1.1
    * uses the low 32 bits, seed 0). Public algorithm (Collet's xxHash
    * spec); implemented here because the JDK has no xxh64.
    */
  def xxhash64(b: Array[Byte], off: Int, len: Int, seed: Long = 0L): Long = {
    def le64(i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 8) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    def le32(i: Int): Long = {
      var v = 0L; var k = 0
      while (k < 4) { v |= (b(i + k) & 0xffL) << (8 * k); k += 1 }
      v
    }
    def round(acc: Long, lane: Long): Long =
      java.lang.Long.rotateLeft(acc + lane * P2, 31) * P1
    var p = off
    val end = off + len
    var acc =
      if (len >= 32) {
        var a1 = seed + P1 + P2; var a2 = seed + P2; var a3 = seed; var a4 = seed - P1
        while (p + 32 <= end) {
          a1 = round(a1, le64(p)); a2 = round(a2, le64(p + 8))
          a3 = round(a3, le64(p + 16)); a4 = round(a4, le64(p + 24))
          p += 32
        }
        var h = java.lang.Long.rotateLeft(a1, 1) + java.lang.Long.rotateLeft(a2, 7) +
          java.lang.Long.rotateLeft(a3, 12) + java.lang.Long.rotateLeft(a4, 18)
        h = (h ^ round(0L, a1)) * P1 + P4
        h = (h ^ round(0L, a2)) * P1 + P4
        h = (h ^ round(0L, a3)) * P1 + P4
        h = (h ^ round(0L, a4)) * P1 + P4
        h
      } else seed + P5
    acc += len
    while (p + 8 <= end) {
      acc = java.lang.Long.rotateLeft(acc ^ round(0L, le64(p)), 27) * P1 + P4
      p += 8
    }
    if (p + 4 <= end) {
      acc = java.lang.Long.rotateLeft(acc ^ (le32(p) * P1), 23) * P2 + P3
      p += 4
    }
    while (p < end) {
      acc = java.lang.Long.rotateLeft(acc ^ ((b(p) & 0xffL) * P5), 11) * P1
      p += 1
    }
    acc ^= acc >>> 33; acc *= P2
    acc ^= acc >>> 29; acc *= P3
    acc ^= acc >>> 32
    acc
  }

  // ----------------------------------------------------------- decoding

  private val MaxBlockSize = 1 << 17 // 128 KiB, the format's block cap

  /** Per-frame mutable decode context: the output window (a flat
    * growable buffer — match copies read it in place, so overlapping
    * LZ copies are the classic byte loop, not a re-materialization)
    * plus the entropy tables and repcodes that Repeat/Treeless modes
    * carry across blocks.
    */
  private final class FrameCtx(maxOutput: Int) {
    var buf: Array[Byte] = new Array[Byte](1 << 16)
    var len: Int = 0
    private def ensure(n: Int): Unit = {
      require(len.toLong + n <= maxOutput, "frame output over decoder cap")
      if (len + n > buf.length) {
        var cap = buf.length
        while (cap < len + n) cap <<= 1
        buf = java.util.Arrays.copyOf(buf, math.min(cap, maxOutput).max(len + n))
      }
    }
    def write(src: Array[Byte], off: Int, n: Int): Unit = {
      ensure(n); System.arraycopy(src, off, buf, len, n); len += n
    }
    def fill(v: Byte, n: Int): Unit = {
      ensure(n); java.util.Arrays.fill(buf, len, len + n, v); len += n
    }
    /** LZ match copy: byte loop handles overlap (offset < length). */
    def copyMatch(offset: Int, length: Int): Unit = {
      require(offset > 0 && offset <= len, s"match offset $offset beyond window $len")
      ensure(length)
      var i = 0
      while (i < length) { buf(len + i) = buf(len + i - offset); i += 1 }
      len += length
    }
    def payload: Array[Byte] = java.util.Arrays.copyOf(buf, len)
    var huff: HuffTable = null
    var llT: FseTable = null
    var mlT: FseTable = null
    var ofT: FseTable = null
    val rep: Array[Int] = Array(1, 4, 8)
  }

  private def le(b: Array[Byte], off: Int, n: Int): Long = {
    var v = 0L; var k = 0
    while (k < n) { v |= (b(off + k) & 0xffL) << (8 * k); k += 1 }
    v
  }

  /** Decode the literals section of a compressed block; returns
    * (literals, bytesConsumed).
    */
  private def decodeLiterals(ctx: FrameCtx, b: Array[Byte], from: Int, blockEnd: Int): (Array[Byte], Int) = {
    require(from < blockEnd, "missing literals header")
    val h0 = b(from) & 0xff
    val litType = h0 & 3
    val sizeFmt = (h0 >> 2) & 3
    litType match {
      case 0 | 1 => // Raw | RLE
        val (regen, headBytes) = sizeFmt match {
          case 0 | 2 => (h0 >> 3, 1)
          case 1 => (((h0 >> 4) | ((b(from + 1) & 0xff) << 4)), 2)
          case _ => ((h0 >> 4) | ((b(from + 1) & 0xff) << 4) | ((b(from + 2) & 0xff) << 12), 3)
        }
        require(regen <= MaxBlockSize, "literals over block cap")
        if (litType == 0) {
          require(from + headBytes + regen <= blockEnd, "truncated raw literals")
          val lit = java.util.Arrays.copyOfRange(b, from + headBytes, from + headBytes + regen)
          (lit, headBytes + regen)
        } else {
          require(from + headBytes + 1 <= blockEnd, "truncated RLE literal")
          val lit = new Array[Byte](regen)
          java.util.Arrays.fill(lit, b(from + headBytes))
          (lit, headBytes + 1)
        }
      case _ => // Compressed | Treeless
        val (regen, csize, headBytes, fourStreams) = sizeFmt match {
          case 0 =>
            val v = le(b, from, 3).toInt
            (((v >> 4) & 0x3ff), (v >> 14) & 0x3ff, 3, false)
          case 1 =>
            val v = le(b, from, 3).toInt
            (((v >> 4) & 0x3ff), (v >> 14) & 0x3ff, 3, true)
          case 2 =>
            val v = le(b, from, 4)
            ((((v >> 4) & 0x3fff).toInt, ((v >> 18) & 0x3fff).toInt, 4, true))
          case _ =>
            val v = le(b, from, 5)
            ((((v >> 4) & 0x3ffff).toInt, ((v >> 22) & 0x3ffff).toInt, 5, true))
        }
        require(regen <= MaxBlockSize, "literals over block cap")
        require(from + headBytes + csize <= blockEnd, "truncated compressed literals")
        var p = from + headBytes
        val streamsEnd = from + headBytes + csize
        if (litType == 2) {
          val (table, used) = readHuffTable(b, p, streamsEnd)
          ctx.huff = table
          p += used
        } else require(ctx.huff != null, "treeless literals with no prior table")
        val lit = new Array[Byte](regen)
        if (!fourStreams) huffDecodeStream(ctx.huff, b, p, streamsEnd, lit, 0, regen)
        else {
          require(streamsEnd - p >= 6, "missing 4-stream jump table")
          val s1 = le(b, p, 2).toInt; val s2 = le(b, p + 2, 2).toInt; val s3 = le(b, p + 4, 2).toInt
          val dataStart = p + 6
          val total = streamsEnd - dataStart
          require(s1 + s2 + s3 <= total, "jump table over stream size")
          val seg = (regen + 3) / 4
          val starts = Array(dataStart, dataStart + s1, dataStart + s1 + s2, dataStart + s1 + s2 + s3)
          val ends = Array(starts(1), starts(2), starts(3), streamsEnd)
          var i = 0
          var outOff = 0
          while (i < 4) {
            val n = if (i < 3) seg else regen - 3 * seg
            require(n >= 0, "negative fourth-stream segment")
            huffDecodeStream(ctx.huff, b, starts(i), ends(i), lit, outOff, n)
            outOff += n
            i += 1
          }
        }
        (lit, headBytes + csize)
    }
  }

  /** Resolve one sequence-table mode byte pair into a decode table. */
  private def seqTable(
      ctx: FrameCtx, mode: Int, b: Array[Byte], from: Int, blockEnd: Int,
      predefined: FseTable, maxAccuracy: Int, maxSym: Int,
      prior: FseTable): (FseTable, Int) = mode match {
    case 0 => (predefined, 0)
    case 1 =>
      require(from < blockEnd, "truncated RLE table byte")
      val sym = b(from) & 0xff
      require(sym <= maxSym, "RLE symbol over alphabet")
      (rleTable(sym), 1)
    case 2 =>
      val (t, used) = readFseTable(b, from, blockEnd, maxAccuracy, maxSym)
      (t, used)
    case _ =>
      require(prior != null, "repeat mode with no prior table")
      (prior, 0)
  }

  /** Decode one compressed block into ctx.out. */
  private def decodeCompressedBlock(ctx: FrameCtx, b: Array[Byte], from: Int, blockEnd: Int): Unit = {
    val (literals, litBytes) = decodeLiterals(ctx, b, from, blockEnd)
    var p = from + litBytes
    require(p < blockEnd, "missing sequences header")
    val b0 = b(p) & 0xff
    var nbSeq = 0
    if (b0 < 128) { nbSeq = b0; p += 1 }
    else if (b0 < 255) { nbSeq = ((b0 - 128) << 8) | (b(p + 1) & 0xff); p += 2 }
    else { nbSeq = ((b(p + 1) & 0xff) | ((b(p + 2) & 0xff) << 8)) + 0x7f00; p += 3 }
    if (nbSeq == 0) {
      require(p == blockEnd, "trailing bytes after literals-only block")
      ctx.write(literals, 0, literals.length)
      return
    }
    val modes = b(p) & 0xff; p += 1
    require((modes & 3) == 0, "reserved sequence-mode bits set")
    val (llT, llUsed) = seqTable(ctx, (modes >> 6) & 3, b, p, blockEnd, LlPredefined, 9, 35, ctx.llT)
    p += llUsed
    val (ofT, ofUsed) = seqTable(ctx, (modes >> 4) & 3, b, p, blockEnd, OfPredefined, 8, 31, ctx.ofT)
    p += ofUsed
    val (mlT, mlUsed) = seqTable(ctx, (modes >> 2) & 3, b, p, blockEnd, MlPredefined, 9, 52, ctx.mlT)
    p += mlUsed
    ctx.llT = llT; ctx.ofT = ofT; ctx.mlT = mlT

    val bits = new BackBits(b, p, blockEnd)
    var llS = bits.read(llT.accuracyLog)
    var ofS = bits.read(ofT.accuracyLog)
    var mlS = bits.read(mlT.accuracyLog)
    require(!bits.overflowed, "sequence stream shorter than its states")

    val blockStart = ctx.len
    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val ofCode = ofT.symbol(ofS)
      require(ofCode <= 31, "offset code over 31")
      val ofValue = (1L << ofCode) + bits.readLong(ofCode)
      val mlCode = mlT.symbol(mlS)
      val ml = MlBase(mlCode) + bits.read(MlBits(mlCode))
      val llCode = llT.symbol(llS)
      val ll = LlBase(llCode) + bits.read(LlBits(llCode))
      require(!bits.overflowed, "sequence stream exhausted early")
      val offset: Int =
        if (ofValue > 3) {
          val o = (ofValue - 3).toInt
          ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o
          o
        } else {
          val idx = if (ll == 0) ofValue.toInt + 1 else ofValue.toInt
          idx match {
            case 1 => ctx.rep(0)
            case 2 =>
              val o = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o; o
            case 3 =>
              val o = ctx.rep(2); ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o; o
            case _ =>
              val o = ctx.rep(0) - 1
              require(o > 0, "repcode underflow")
              ctx.rep(2) = ctx.rep(1); ctx.rep(1) = ctx.rep(0); ctx.rep(0) = o; o
          }
        }
      require(litPos + ll <= literals.length, "literals overrun")
      ctx.write(literals, litPos, ll)
      litPos += ll
      ctx.copyMatch(offset, ml)
      if (seq != nbSeq - 1) { // no state update after the last sequence
        llS = llT.base(llS) + bits.read(llT.nbBits(llS))
        mlS = mlT.base(mlS) + bits.read(mlT.nbBits(mlS))
        ofS = ofT.base(ofS) + bits.read(ofT.nbBits(ofS))
        require(!bits.overflowed, "sequence states exhausted early")
      }
      seq += 1
    }
    require(bits.exhausted, "sequence stream not fully consumed")
    ctx.write(literals, litPos, literals.length - litPos)
    require(ctx.len - blockStart <= MaxBlockSize, "block output over 128 KiB cap")
  }

  /** Decode ONE frame starting at `pos`. Returns Some((payload,
    * nextPos)) or None on any corruption (strict: checksum verified
    * when present, frame content size cross-checked when present).
    * Skippable frames return Some((empty, nextPos)).
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
      val fhd = b(p) & 0xff; p += 1
      val fcsFlag = fhd >> 6
      val singleSegment = (fhd & 0x20) != 0
      val hasChecksum = (fhd & 0x04) != 0
      if ((fhd & 0x08) != 0) return None // reserved bit
      val dictFlag = fhd & 3
      if (!singleSegment) {
        val wd = b(p) & 0xff; p += 1
        val windowLog = 10 + (wd >> 3)
        if (windowLog > 30) return None // allocation guard: 1 GiB max
      }
      val dictBytes = Array(0, 1, 2, 4)(dictFlag)
      if (dictBytes > 0) {
        if (le(b, p, dictBytes) != 0L) return None // dictionaries out of subset
        p += dictBytes
      }
      val fcsBytes = fcsFlag match {
        case 0 => if (singleSegment) 1 else 0
        case 1 => 2
        case 2 => 4
        case _ => 8
      }
      var fcs = -1L
      if (fcsBytes > 0) {
        fcs = le(b, p, fcsBytes)
        if (fcsBytes == 2) fcs += 256
        p += fcsBytes
      }
      val ctx = new FrameCtx(maxOutput = 1 << 30) // corrupt-input allocation guard
      var last = false
      while (!last) {
        if (b.length - p < 3) return None
        val bh = le(b, p, 3).toInt; p += 3
        last = (bh & 1) == 1
        val btype = (bh >> 1) & 3
        val bsize = bh >>> 3
        btype match {
          case 0 => // raw
            if (p + bsize > b.length || bsize > MaxBlockSize) return None
            ctx.write(b, p, bsize); p += bsize
          case 1 => // RLE
            if (p >= b.length || bsize > MaxBlockSize) return None
            ctx.fill(b(p), bsize); p += 1
          case 2 =>
            if (p + bsize > b.length || bsize > MaxBlockSize) return None
            decodeCompressedBlock(ctx, b, p, p + bsize); p += bsize
          case _ => return None // reserved
        }
      }
      val payload = ctx.payload
      if (fcs >= 0 && payload.length.toLong != fcs) return None
      if (hasChecksum) {
        if (p + 4 > b.length) return None
        val want = le(b, p, 4)
        if ((xxhash64(payload, 0, payload.length) & 0xffffffffL) != want) return None
        p += 4
      }
      Some((payload, p))
    } catch { case _: Exception => None }
  }

  /** Decode-free frame index: hop over frame and block HEADERS only —
    * no entropy decode, no output buffer — to find member boundaries at
    * I/O speed. This is what makes a 100 TB `.zst` corpus SPLITTABLE
    * (boundary discovery costs bytes-read, not decompression) and what
    * a ranged fetch plans with: decode only the frames that hold the
    * rows you want, skip the rest ([[Mp4Codec]]'s keyframe-plan pattern
    * for compressed text). Returns (offset, compressedLen) per DATA
    * frame (skippables hopped); None entries are impossible — a frame
    * whose headers cannot be walked ends the index at that offset with
    * a (-1)-length sentinel so callers see the corruption boundary.
    */
  def frameIndex(b: Array[Byte]): Seq[(Long, Long)] = {
    val out = scala.collection.mutable.Buffer.empty[(Long, Long)]
    if (b == null || b.isEmpty) return out.toSeq
    var pos = 0
    var corrupt = false
    while (pos < b.length && !corrupt) {
      val start = pos
      skipFrame(b, pos) match {
        case Some((isData, next)) =>
          if (isData) out += ((start.toLong, (next - start).toLong))
          pos = next
        case None =>
          out += ((start.toLong, -1L))
          corrupt = true
      }
    }
    out.toSeq
  }

  /** Header-hop one frame: Some((isDataFrame, nextPos)) or None. */
  private def skipFrame(b: Array[Byte], pos: Int): Option[(Boolean, Int)] = {
    try {
      if (b.length - pos < 4) return None
      val magic = le(b, pos, 4).toInt
      if ((magic & 0xfffffff0) == SkipMagicBase) {
        if (b.length - pos < 8) return None
        val next = pos + 8 + le(b, pos + 4, 4)
        if (next > b.length) return None
        return Some((false, next.toInt))
      }
      if (magic != FrameMagic) return None
      var p = pos + 4
      val fhd = b(p) & 0xff; p += 1
      val fcsFlag = fhd >> 6
      val singleSegment = (fhd & 0x20) != 0
      if ((fhd & 0x08) != 0) return None
      if (!singleSegment) p += 1 // window descriptor
      p += Array(0, 1, 2, 4)(fhd & 3) // dict id
      p += (fcsFlag match {
        case 0 => if (singleSegment) 1 else 0
        case 1 => 2
        case 2 => 4
        case _ => 8
      })
      var last = false
      while (!last) {
        if (b.length - p < 3) return None
        val bh = le(b, p, 3).toInt; p += 3
        last = (bh & 1) == 1
        val btype = (bh >> 1) & 3
        val bsize = bh >>> 3
        btype match {
          case 0 | 2 => p += bsize // raw | compressed: hop the payload
          case 1 => p += 1 // RLE: one byte regardless of size
          case _ => return None
        }
        if (p > b.length) return None
      }
      if ((fhd & 0x04) != 0) p += 4 // content checksum
      if (p > b.length) return None
      Some((true, p))
    } catch { case _: Exception => None }
  }

  /** Strict whole-payload decode: every frame must verify; frames
    * concatenate (skippable frames contribute nothing). None on any
    * corruption or trailing garbage.
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

  /** Member walk with quarantine-and-resync — the [[Warc.gzipMembers]]
    * contract for zstd: a corrupt frame yields (offset, null) and the
    * walk resynchronizes at the next VALID frame (a found magic must
    * also decode — compressed bytes can contain the magic by chance).
    *
    * Detection contract: quarantine is only as strong as the frame's
    * own integrity data. gzip members carry a mandatory CRC-32; zstd
    * checksums are OPTIONAL (the CLI default writes them, the library
    * default does not) — a truncated checksum-less frame can absorb the
    * next frame's bytes as raw-block content and "decode". Corpus
    * writers wanting the quarantine guarantee must write checksummed
    * frames; the spec pins both behaviors.
    */
  def members(b: Array[Byte]): Seq[(Long, Array[Byte])] = {
    val out = scala.collection.mutable.Buffer.empty[(Long, Array[Byte])]
    if (b == null || b.isEmpty) return out.toSeq
    var pos = 0
    while (pos < b.length) {
      val start = pos
      decodeFrame(b, pos) match {
        case Some((data, next)) =>
          if (!isSkippable(b, start)) out += ((start.toLong, data))
          pos = next
        case None =>
          var n = pos + 1
          var next = b.length
          while (next == b.length && n <= b.length - 4) {
            if ((le(b, n, 4).toInt == FrameMagic ||
              (le(b, n, 4).toInt & 0xfffffff0) == SkipMagicBase) &&
              decodeFrame(b, n).isDefined) next = n
            n += 1
          }
          out += ((start.toLong, null))
          pos = next
      }
    }
    out.toSeq
  }

  private def isSkippable(b: Array[Byte], pos: Int): Boolean =
    b.length - pos >= 4 && (le(b, pos, 4).toInt & 0xfffffff0) == SkipMagicBase

  // ------------------------------------------------------------- Spark

  final case class ZstMember(
      doc_id: Long,
      offset: Long,
      decoded_bytes: Long,
      body_text: String,
      corrupt: Boolean)

  /** Partition-parallel member walk over (doc_id, payload) — one row
    * per zstd frame (corrupt frames quarantine at their offset). The
    * splittable-ingest shape: frame boundaries are record boundaries,
    * so a sharded `.zst` corpus fans out without a record crossing a
    * task, exactly the [[Warc.parseRecords]] contract.
    */
  def parseMembers(media: org.apache.spark.sql.DataFrame)(
      implicit spark: org.apache.spark.sql.SparkSession): org.apache.spark.sql.Dataset[ZstMember] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        members(bytes).map {
          case (off, null) => ZstMember(id, off, -1L, "", corrupt = true)
          case (off, data) => ZstMember(id, off, data.length.toLong,
            new String(data, "UTF-8"), corrupt = false)
        }
      })
  }
}
