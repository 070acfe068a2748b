package graft.operators

/** Pure-JVM WebP-lossless (VP8L) codec — shrinks the media seam again
  * ([[Multimodal]] scaladoc): the JDK's ImageIO has no WebP plugin, so
  * this implements the format from the public bitstream spec (RFC 9649
  * §3, "Specification for WebP Lossless Bitstream"): the RIFF/WEBP/VP8L
  * container, LSB-first bit reading, canonical prefix codes (both the
  * simple 1–2-symbol form and the full code-length-coded form with
  * 16/17/18 repeat codes and the max-symbol shortcut), meta-prefix
  * entropy images, the color cache, LZ77 backward references with the
  * 120-entry 2D distance map, and all four transforms (predictor with
  * its 14 modes, color, subtract-green, color-indexing with sub-byte
  * pixel bundling), applied in reverse order as the spec requires.
  *
  * Decoding is integer-exact by construction (VP8L is lossless), so the
  * decoder returns the encoder's ARGB pixels bit-for-bit — Vp8lSpec
  * asserts it across literal images, LZ77 streams, color-cache streams,
  * every transform, and palette bundling. The in-repo [[encode]] is a
  * fixture encoder (literal pixels through full canonical prefix codes,
  * optional subtract-green) — not a tuned compressor; its streams are
  * spec-valid and decode under any conformant reader.
  *
  * Out of scope, honestly: lossy VP8 frames and the extended VP8X
  * container (animation, EXIF) return None — the decode_ok=false
  * ladder, exactly like the other codecs behind [[Multimodal]].
  */
object Vp8lCodec {

  /** Decoded image: ARGB pixels, row-major. */
  final case class DecodedImage(width: Int, height: Int, argb: Array[Int])

  // ---------------------------------------------------------- bit I/O
  // VP8L reads bits LSB-first within each byte, bytes in stream order.

  private final class BitReader(bytes: Array[Byte], startByte: Int) {
    private var pos: Long = startByte.toLong * 8
    private val limit: Long = bytes.length.toLong * 8
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        if (pos >= limit) throw new IllegalStateException("bitstream overrun")
        val b = (bytes((pos >>> 3).toInt) >> (pos & 7).toInt) & 1
        v |= b << i
        pos += 1
        i += 1
      }
      v
    }
  }

  private[operators] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) {
        cur |= ((v >>> i) & 1) << nBits
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        i += 1
      }
    }
    def finish(): Array[Byte] = {
      if (nBits > 0) { out.write(cur); cur = 0; nBits = 0 }
      out.toByteArray
    }
  }

  // ------------------------------------------------------ prefix codes

  /** Canonical prefix-code decoder built from code lengths — the
    * RFC 9649 §3.5.2 assignment (shorter codes first, ties by symbol
    * order, codes read LSB-first so we walk bit by bit through a tree
    * packed as arrays).
    */
  private final class PrefixCode(lengths: Array[Int]) {
    // build canonical codes (MSB-first values per spec), then a lookup
    // walked one bit at a time in reversed (read) order
    private val maxLen = lengths.foldLeft(0)(math.max)
    // tree as array: node i has children 2i+1, 2i+2; value nodes hold
    // symbol, -1 = internal, -2 = unused
    private val tree = new Array[Int](if (maxLen == 0) 1 else (1 << (maxLen + 1)))
    java.util.Arrays.fill(tree, -2)
    val singleSymbol: Int =
      if (lengths.count(_ > 0) == 1) lengths.indexWhere(_ > 0) else -1
    if (maxLen > 0) {
      require(maxLen <= 15, "code length > 15")
      val count = new Array[Int](maxLen + 1)
      lengths.foreach(l => if (l > 0) count(l) += 1)
      val nextCode = new Array[Int](maxLen + 2)
      var code = 0
      var l = 1
      while (l <= maxLen) {
        code = (code + count(l - 1)) << 1
        nextCode(l) = code
        l += 1
      }
      var sym = 0
      while (sym < lengths.length) {
        val len = lengths(sym)
        if (len > 0) {
          val c = nextCode(len)
          nextCode(len) += 1
          // insert into tree: bits MSB-first along the canonical code
          var node = 0
          var bit = len - 1
          while (bit >= 0) {
            tree(node) = -1
            node = 2 * node + 1 + ((c >>> bit) & 1)
            bit -= 1
          }
          require(tree(node) == -2, "overfull prefix code")
          tree(node) = sym
        }
        sym += 1
      }
    }
    def read(r: BitReader): Int = {
      if (singleSymbol >= 0) return singleSymbol // zero bits consumed
      var node = 0
      while (tree(node) == -1) node = 2 * node + 1 + r.readBits(1)
      val s = tree(node)
      require(s >= 0, "invalid prefix code path")
      s
    }
  }

  private val CodeLengthOrder =
    Array(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Read one prefix code (simple or code-length-coded) for an alphabet
    * of `alphabetSize` symbols. Returns the code-length array.
    */
  private def readPrefixCodeLengths(r: BitReader, alphabetSize: Int): Array[Int] = {
    val lengths = new Array[Int](alphabetSize)
    if (r.readBits(1) == 1) { // simple code
      val numSymbols = r.readBits(1) + 1
      val firstWide = r.readBits(1) == 1
      val s0 = if (firstWide) r.readBits(8) else r.readBits(1)
      require(s0 < alphabetSize, "simple symbol out of range")
      if (numSymbols == 2) {
        val s1 = r.readBits(8)
        require(s1 < alphabetSize, "simple symbol out of range")
        lengths(s0) = 1
        lengths(s1) = 1
      } else lengths(s0) = 1 // single symbol: zero-bit code
      lengths
    } else {
      val numCodeLengths = 4 + r.readBits(4)
      val clLengths = new Array[Int](19)
      var i = 0
      while (i < numCodeLengths) {
        clLengths(CodeLengthOrder(i)) = r.readBits(3)
        i += 1
      }
      val clCode = new PrefixCode(clLengths)
      val maxSymbol =
        if (r.readBits(1) == 1) {
          val nbits = 2 + 2 * r.readBits(3)
          2 + r.readBits(nbits)
        } else alphabetSize
      var sym = 0
      var prevLen = 8
      var remaining = maxSymbol
      while (sym < alphabetSize && remaining > 0) {
        remaining -= 1
        val cl = clCode.read(r)
        cl match {
          case 16 =>
            val rep = 3 + r.readBits(2)
            var j = 0
            while (j < rep && sym < alphabetSize) {
              lengths(sym) = prevLen; sym += 1; j += 1
            }
          case 17 =>
            val rep = 3 + r.readBits(3)
            sym += rep
          case 18 =>
            val rep = 11 + r.readBits(7)
            sym += rep
          case l =>
            lengths(sym) = l
            if (l != 0) prevLen = l
            sym += 1
        }
      }
      lengths
    }
  }

  // -------------------------------------------------- LZ77 distance map

  /** The 120-entry (dx, dy) neighbor map for distance codes 1..120
    * (RFC 9649 §3.6.2.3); codes > 120 are linear distances − 120.
    */
  private val DistanceMap: Array[(Int, Int)] = Array(
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7))

  /** Prefix-coded LZ77 value (length or distance code): codes 0–3 map
    * to 1–4; past that, (2 + (code & 1)) << extra plus extra bits + 1.
    */
  private def lz77Value(code: Int, r: BitReader): Int = {
    if (code < 4) code + 1
    else {
      val extraBits = (code - 2) >> 1
      val offset = (2 + (code & 1)) << extraBits
      offset + r.readBits(extraBits) + 1
    }
  }

  // ------------------------------------------------------------ decode

  private final class Group(
      val green: PrefixCode, val red: PrefixCode, val blue: PrefixCode,
      val alpha: PrefixCode, val dist: PrefixCode)

  /** One image stream (RFC 9649 §3.7): transforms (level-0 only), color
    * cache, meta prefix (level-0 only), prefix groups, pixel decode.
    * Returns (width-after-bundling handled internally) the ARGB pixels
    * at the DECLARED size after inverse transforms.
    */
  private def decodeImageStream(
      r: BitReader, xsize0: Int, ysize: Int, level0: Boolean): Array[Int] = {
    var xsize = xsize0
    // transforms
    case class Transform(tpe: Int, bits: Int, data: Array[Int], argXs: Int)
    var transforms = List.empty[Transform]
    if (level0) {
      var seen = Set.empty[Int]
      while (r.readBits(1) == 1) {
        val t = r.readBits(2)
        require(!seen.contains(t), "duplicate transform")
        seen += t
        t match {
          case 0 | 1 => // predictor / color
            val bits = 2 + r.readBits(3)
            val bw = (xsize + (1 << bits) - 1) >> bits
            val bh = (ysize + (1 << bits) - 1) >> bits
            val sub = decodeImageStream(r, bw, bh, level0 = false)
            transforms ::= Transform(t, bits, sub, xsize)
          case 2 => // subtract green
            transforms ::= Transform(2, 0, null, xsize)
          case 3 => // color indexing
            val tableSize = r.readBits(8) + 1
            val palette = decodeImageStream(r, tableSize, 1, level0 = false)
            // palette entries are delta-coded: add previous
            var i = 1
            while (i < tableSize) {
              palette(i) = addPixels(palette(i), palette(i - 1))
              i += 1
            }
            val widthBits =
              if (tableSize <= 2) 3
              else if (tableSize <= 4) 2
              else if (tableSize <= 16) 1
              else 0
            transforms ::= Transform(3, widthBits, palette, xsize)
            xsize = (xsize + (1 << widthBits) - 1) >> widthBits
          case _ => throw new IllegalStateException("bad transform")
        }
      }
    }
    // color cache
    val cacheBits = if (r.readBits(1) == 1) r.readBits(4) else 0
    require(cacheBits <= 11, "color cache bits out of range")
    val cacheSize = if (cacheBits > 0) 1 << cacheBits else 0
    val cache = if (cacheSize > 0) new Array[Int](cacheSize) else null
    // meta prefix
    var metaBits = 0
    var metaImage: Array[Int] = null
    var numGroups = 1
    if (level0 && r.readBits(1) == 1) {
      metaBits = 2 + r.readBits(3)
      val mw = (xsize + (1 << metaBits) - 1) >> metaBits
      val mh = (ysize + (1 << metaBits) - 1) >> metaBits
      metaImage = decodeImageStream(r, mw, mh, level0 = false)
      var m = 0
      metaImage = metaImage.map { p =>
        val idx = ((p >> 8) & 0xFFFF) // meta index packed in red+green
        if (idx + 1 > m) m = idx + 1
        idx
      }
      numGroups = m
    }
    val groups = Array.tabulate(numGroups) { _ =>
      val g = new PrefixCode(readPrefixCodeLengths(r, 256 + 24 + cacheSize))
      val red = new PrefixCode(readPrefixCodeLengths(r, 256))
      val blue = new PrefixCode(readPrefixCodeLengths(r, 256))
      val alpha = new PrefixCode(readPrefixCodeLengths(r, 256))
      val dist = new PrefixCode(readPrefixCodeLengths(r, 40))
      new Group(g, red, blue, alpha, dist)
    }
    // pixel decode
    val n = xsize * ysize
    val out = new Array[Int](n)
    val mw = if (metaImage != null) (xsize + (1 << metaBits) - 1) >> metaBits else 0
    def groupAt(x: Int, y: Int): Group =
      if (metaImage == null) groups(0)
      else groups(metaImage((y >> metaBits) * mw + (x >> metaBits)))
    def insertCache(p: Int): Unit =
      if (cache != null)
        cache(((0x1e35a7bd * p) >>> (32 - cacheBits)).toInt & (cacheSize - 1)) = p
    var pos = 0
    while (pos < n) {
      val x = pos % xsize
      val y = pos / xsize
      val g = groupAt(x, y)
      val s = g.green.read(r)
      if (s < 256) {
        val red = g.red.read(r)
        val blue = g.blue.read(r)
        val alpha = g.alpha.read(r)
        val p = (alpha << 24) | (red << 16) | (s << 8) | blue
        out(pos) = p
        insertCache(p)
        pos += 1
      } else if (s < 256 + 24) {
        val length = lz77Value(s - 256, r)
        val distCode = lz77Value(g.dist.read(r), r)
        val dist0 =
          if (distCode <= 120) {
            val (dx, dy) = DistanceMap(distCode - 1)
            val d = dy * xsize + dx
            if (d < 1) 1 else d
          } else distCode - 120
        require(dist0 <= pos, "LZ77 distance before image start")
        var j = 0
        while (j < length) {
          require(pos < n, "LZ77 copy past image end")
          val p = out(pos - dist0)
          out(pos) = p
          insertCache(p)
          pos += 1
          j += 1
        }
      } else {
        require(cache != null, "cache symbol without cache")
        val p = cache(s - 256 - 24)
        out(pos) = p
        insertCache(p)
        pos += 1
      }
    }
    // inverse transforms, reverse order of appearance in the stream
    var pixels = out
    var curXs = xsize
    transforms.foreach { tr =>
      tr.tpe match {
        case 3 => // color indexing: unbundle + palette lookup
          val widthBits = tr.bits
          val palette = tr.data
          val fullXs = tr.argXs
          val res = new Array[Int](fullXs * ysize)
          val perByte = 1 << widthBits
          val idxBits = 8 >> widthBits
          val mask = (1 << idxBits) - 1
          var y = 0
          while (y < ysize) {
            var x = 0
            while (x < fullXs) {
              val packed = (pixels(y * curXs + x / perByte) >> 8) & 0xFF
              val idx = (packed >> (idxBits * (x % perByte))) & mask
              res(y * fullXs + x) =
                if (idx < palette.length) palette(idx) else 0
              x += 1
            }
            y += 1
          }
          pixels = res
          curXs = fullXs
        case 2 => // subtract green inverse: r += g, b += g
          var i = 0
          while (i < pixels.length) {
            val p = pixels(i)
            val gch = (p >> 8) & 0xFF
            val red = (((p >> 16) & 0xFF) + gch) & 0xFF
            val blue = ((p & 0xFF) + gch) & 0xFF
            pixels(i) = (p & 0xFF00FF00) | (red << 16) | blue
            i += 1
          }
        case 1 => // color transform inverse
          val bits = tr.bits
          val bw = (curXs + (1 << bits) - 1) >> bits
          var y = 0
          while (y < ysize) {
            var x = 0
            while (x < curXs) {
              // multiplier packing (RFC 9649 §3.4.1.2): green_to_red in
              // the BLUE byte, green_to_blue in the GREEN byte,
              // red_to_blue in the RED byte — all signed 3.5 fixed-point
              val cte = tr.data((y >> bits) * bw + (x >> bits))
              val g2r = cte.toByte.toInt
              val g2b = (cte >> 8).toByte.toInt
              val r2b = (cte >> 16).toByte.toInt
              val p = pixels(y * curXs + x)
              val gch = (p >> 8) & 0xFF
              var red = (p >> 16) & 0xFF
              var blue = p & 0xFF
              red = (red + ((g2r * (gch.toByte.toInt)) >> 5)) & 0xFF
              blue = (blue + ((g2b * (gch.toByte.toInt)) >> 5)) & 0xFF
              blue = (blue + ((r2b * (red.toByte.toInt)) >> 5)) & 0xFF
              pixels(y * curXs + x) = (p & 0xFF00FF00) | (red << 16) | blue
              x += 1
            }
            y += 1
          }
        case 0 => // predictor inverse
          val bits = tr.bits
          val bw = (curXs + (1 << bits) - 1) >> bits
          var y = 0
          while (y < ysize) {
            var x = 0
            while (x < curXs) {
              val i = y * curXs + x
              val mode =
                if (x == 0 && y == 0) -1 // ARGB_BLACK base
                else if (y == 0) -2 // L
                else if (x == 0) -3 // T
                else (tr.data((y >> bits) * bw + (x >> bits)) >> 8) & 0xFF
              val pred = predict(mode, pixels, i, x, y, curXs)
              pixels(i) = addPixels(pixels(i), pred)
              x += 1
            }
            y += 1
          }
        case _ => ()
      }
    }
    pixels
  }

  /** Per-channel modular add of two ARGB pixels. */
  private def addPixels(a: Int, b: Int): Int = {
    val ch = (((a >>> 24) + (b >>> 24)) & 0xFF) << 24
    val rr = ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
    val gg = ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
    val bb = ((a & 0xFF) + (b & 0xFF)) & 0xFF
    ch | rr | gg | bb
  }

  private def avg2(a: Int, b: Int): Int = {
    val ch = ((((a >>> 24) + (b >>> 24)) / 2) & 0xFF) << 24
    val rr = (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) / 2) & 0xFF) << 16
    val gg = (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) / 2) & 0xFF) << 8
    val bb = (((a & 0xFF) + (b & 0xFF)) / 2) & 0xFF
    ch | rr | gg | bb
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  /** The 14 predictor modes (RFC 9649 §3.4.1.1) plus the implicit edge
    * rules (-1 black, -2 left, -3 top).
    */
  private def predict(mode: Int, px: Array[Int], i: Int, x: Int, y: Int,
      xs: Int): Int = {
    // block modes only ever dispatch for x > 0, y > 0 (edges use the
    // -1/-2/-3 rules), so all four neighbors are in bounds; top-right at
    // the last column reads the CURRENT row's first pixel — the
    // contiguous-memory semantics the format defines
    def L = px(i - 1)
    def T = px(i - xs)
    def TL = px(i - xs - 1)
    def TR = px(i - xs + 1)
    mode match {
      case -1 => 0xFF000000
      case -2 | 1 => L
      case -3 | 2 => T
      case 0 => 0xFF000000
      case 3 => TR
      case 4 => TL
      case 5 => avg2(avg2(L, TR), T)
      case 6 => avg2(L, TL)
      case 7 => avg2(L, T)
      case 8 => avg2(TL, T)
      case 9 => avg2(T, TR)
      case 10 => avg2(avg2(L, TL), avg2(T, TR))
      case 11 => // Select: the closer of L/T to (L + T − TL), ties → T
        val l = L; val t = T; val tl = TL
        val pAlpha = (l >>> 24) + (t >>> 24) - (tl >>> 24)
        val pRed = ((l >> 16) & 0xFF) + ((t >> 16) & 0xFF) - ((tl >> 16) & 0xFF)
        val pGreen = ((l >> 8) & 0xFF) + ((t >> 8) & 0xFF) - ((tl >> 8) & 0xFF)
        val pBlue = (l & 0xFF) + (t & 0xFF) - (tl & 0xFF)
        val pL = math.abs(pAlpha - (l >>> 24)) + math.abs(pRed - ((l >> 16) & 0xFF)) +
          math.abs(pGreen - ((l >> 8) & 0xFF)) + math.abs(pBlue - (l & 0xFF))
        val pT = math.abs(pAlpha - (t >>> 24)) + math.abs(pRed - ((t >> 16) & 0xFF)) +
          math.abs(pGreen - ((t >> 8) & 0xFF)) + math.abs(pBlue - (t & 0xFF))
        if (pL < pT) l else t
      case 12 => // ClampAddSubtractFull
        val l = L; val t = T; val tl = TL
        def ch(sh: Int): Int =
          clamp255(((l >>> sh) & 0xFF) + ((t >>> sh) & 0xFF) - ((tl >>> sh) & 0xFF))
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      case 13 => // ClampAddSubtractHalf
        val l = L; val t = T; val tl = TL
        val a = avg2(l, t)
        def ch(sh: Int): Int = {
          val av = (a >>> sh) & 0xFF
          clamp255(av + (av - ((tl >>> sh) & 0xFF)) / 2)
        }
        (ch(24) << 24) | (ch(16) << 16) | (ch(8) << 8) | ch(0)
      case _ => throw new IllegalStateException(s"bad predictor $mode")
    }
  }

  /** Decode a WebP byte stream; None for non-WebP, lossy VP8, or VP8X. */
  def decode(bytes: Array[Byte]): Option[DecodedImage] = {
    try {
      if (bytes == null || bytes.length < 30) return None
      def fourcc(o: Int, s: String): Boolean =
        (0 until 4).forall(i => bytes(o + i) == s.charAt(i).toByte)
      if (!fourcc(0, "RIFF") || !fourcc(8, "WEBP")) return None
      if (!fourcc(12, "VP8L")) return None // lossy/VP8X: out of subset
      if ((bytes(20) & 0xFF) != 0x2F) return None // VP8L signature
      val r = new BitReader(bytes, 21)
      val width = r.readBits(14) + 1
      val height = r.readBits(14) + 1
      r.readBits(1) // alpha hint
      if (r.readBits(3) != 0) return None // version must be 0
      val px = decodeImageStream(r, width, height, level0 = true)
      require(px.length == width * height, "pixel count mismatch")
      Some(DecodedImage(width, height, px))
    } catch { case _: Exception => None }
  }

  // ------------------------------------------------------------ encode

  /** Length-limited canonical Huffman code lengths (≤ 15) for a
    * histogram — package-merge-free heuristic: plain Huffman, then
    * flatten any overlong code by the standard depth-rebalance (counts
    * here are fixture-sized, so optimality is irrelevant; validity is
    * what matters).
    */
  private def huffmanLengths(freq: Array[Int]): Array[Int] = {
    val syms = freq.indices.filter(freq(_) > 0)
    val lengths = new Array[Int](freq.length)
    if (syms.isEmpty) return lengths
    if (syms.size == 1) { lengths(syms.head) = 1; return lengths }
    // simple pairing heap via sorted buffer
    final case class Node(w: Long, sym: Int, l: Node, r: Node)
    val ord = Ordering.by[Node, (Long, Int)](n => (n.w, n.sym))
    var heap = scala.collection.mutable.PriorityQueue.empty(ord.reverse)
    syms.foreach(s => heap.enqueue(Node(freq(s), s, null, null)))
    while (heap.size > 1) {
      val a = heap.dequeue(); val b = heap.dequeue()
      heap.enqueue(Node(a.w + b.w, math.min(a.sym, b.sym), a, b))
    }
    def walk(n: Node, d: Int): Unit =
      if (n.l == null) lengths(n.sym) = math.max(1, d)
      else { walk(n.l, d + 1); walk(n.r, d + 1) }
    walk(heap.dequeue(), 0)
    // depth-limit to 15: repeatedly demote (fixture histograms never
    // get near this, but stay spec-safe)
    while (lengths.exists(_ > 15)) {
      val over = lengths.indexWhere(_ > 15)
      lengths(over) = 15
      // ensure Kraft: find a sibling to lengthen
      val k = lengths.filter(_ > 0).map(l => math.pow(2, -l)).sum
      if (k > 1.0) {
        val cand = lengths.indices
          .filter(i => lengths(i) > 0 && lengths(i) < 15)
          .minBy(lengths(_))
        lengths(cand) += 1
      }
    }
    lengths
  }

  /** Write one prefix code in the full (code-length-coded) form. */
  private[operators] def writePrefixCode(w: BitWriter, lengths: Array[Int]): Unit = {
    val used = lengths.count(_ > 0)
    // the simple form carries symbols in at most 8 bits — a length or
    // cache symbol (≥ 256) forces the code-length-coded form
    if (used <= 2 && lengths.indices.forall(i => lengths(i) == 0 || i < 256)) {
      // simple form
      val syms = lengths.indices.filter(lengths(_) > 0)
      w.writeBits(1, 1)
      if (syms.isEmpty) {
        // degenerate: one zero-bit symbol 0 (never read)
        w.writeBits(0, 1) // num_symbols - 1 = 0
        w.writeBits(0, 1) // 1-bit first symbol
        w.writeBits(0, 1)
      } else if (syms.size == 1) {
        w.writeBits(0, 1)
        if (syms.head < 2) { w.writeBits(0, 1); w.writeBits(syms.head, 1) }
        else { w.writeBits(1, 1); w.writeBits(syms.head, 8) }
      } else {
        w.writeBits(1, 1)
        if (syms.head < 2) { w.writeBits(0, 1); w.writeBits(syms.head, 1) }
        else { w.writeBits(1, 1); w.writeBits(syms.head, 8) }
        w.writeBits(syms(1), 8)
      }
      return
    }
    w.writeBits(0, 1)
    // code-length code: encode lengths 0..15 literally (no 16/17/18) —
    // valid, just not maximally compact
    val clFreq = new Array[Int](19)
    lengths.foreach(l => clFreq(l) += 1)
    val clLengths = huffmanLengths(clFreq)
    // emit in CodeLengthOrder, as many as needed to cover all nonzero
    var numCl = 19
    while (numCl > 4 && clLengths(CodeLengthOrder(numCl - 1)) == 0) numCl -= 1
    w.writeBits(numCl - 4, 4)
    var i = 0
    while (i < numCl) { w.writeBits(clLengths(CodeLengthOrder(i)), 3); i += 1 }
    w.writeBits(0, 1) // no max-symbol shortcut
    val clCodes = canonicalCodes(clLengths)
    lengths.foreach { l =>
      val (code, len) = clCodes(l)
      writeCodeMsb(w, code, len)
    }
  }

  /** Per-pixel emit codes for a tree: a SINGLE-symbol code is zero bits
    * on the wire (the format's convention — the decoder consumes
    * nothing), so its emit length is 0, not the canonical 1.
    */
  private[operators] def pixelCodes(lengths: Array[Int]): Array[(Int, Int)] =
    if (lengths.count(_ > 0) == 1) Array.fill(lengths.length)((0, 0))
    else canonicalCodes(lengths)

  /** Canonical code values per symbol for given lengths. */
  private[operators] def canonicalCodes(lengths: Array[Int]): Array[(Int, Int)] = {
    val maxLen = lengths.foldLeft(0)(math.max)
    val count = new Array[Int](maxLen + 1)
    lengths.foreach(l => if (l > 0) count(l) += 1)
    val nextCode = new Array[Int](maxLen + 2)
    var code = 0
    var l = 1
    while (l <= maxLen) {
      code = (code + count(l - 1)) << 1
      nextCode(l) = code
      l += 1
    }
    lengths.map { len =>
      if (len == 0) (0, 0)
      else {
        val c = nextCode(len)
        nextCode(len) += 1
        (c, len)
      }
    }
  }

  /** Prefix-code bits are written MSB-of-the-code first (the canonical
    * code orientation), each bit through the LSB-first byte packer.
    */
  private[operators] def writeCodeMsb(w: BitWriter, code: Int, len: Int): Unit = {
    var bit = len - 1
    while (bit >= 0) { w.writeBits((code >>> bit) & 1, 1); bit -= 1 }
  }

  /** Fixture encoder: ARGB pixels → a valid VP8L stream of pure
    * literals through full canonical prefix codes (one group, no LZ77,
    * no cache, optional subtract-green transform). Spec-valid output
    * any conformant decoder reads; not a compressor.
    */
  def encode(width: Int, height: Int, argb: Array[Int],
      subtractGreen: Boolean = false): Array[Byte] = {
    require(width >= 1 && width <= 16384 && height >= 1 && height <= 16384,
      "dimensions out of VP8L range")
    require(argb.length == width * height, "pixel count mismatch")
    val px =
      if (!subtractGreen) argb
      else argb.map { p =>
        val g = (p >> 8) & 0xFF
        val r0 = (((p >> 16) & 0xFF) - g) & 0xFF
        val b0 = ((p & 0xFF) - g) & 0xFF
        (p & 0xFF00FF00) | (r0 << 16) | b0
      }
    val w = new BitWriter
    w.writeBits(width - 1, 14)
    w.writeBits(height - 1, 14)
    w.writeBits(0, 1) // alpha hint
    w.writeBits(0, 3) // version
    if (subtractGreen) {
      w.writeBits(1, 1) // transform present
      w.writeBits(2, 2) // SUBTRACT_GREEN
    }
    w.writeBits(0, 1) // no more transforms
    writeLiteralBody(w, px, level0 = true)
    wrapContainer(w.finish())
  }

  /** Literal-pixels image-stream body — [no cache][no meta (level0)]
    * [five canonical trees][pixel codes] — the encoder's main path,
    * also reused by Vp8lSpec to embed residual images inside
    * hand-assembled transform streams.
    */
  private[operators] def writeLiteralBody(w: BitWriter, px: Array[Int],
      level0: Boolean): Unit = {
    w.writeBits(0, 1) // no color cache
    if (level0) w.writeBits(0, 1) // no meta prefix
    val gFreq = new Array[Int](256 + 24)
    val rFreq = new Array[Int](256)
    val bFreq = new Array[Int](256)
    val aFreq = new Array[Int](256)
    px.foreach { p =>
      gFreq((p >> 8) & 0xFF) += 1
      rFreq((p >> 16) & 0xFF) += 1
      bFreq(p & 0xFF) += 1
      aFreq((p >>> 24) & 0xFF) += 1
    }
    val gLen = huffmanLengths(gFreq)
    val rLen = huffmanLengths(rFreq)
    val bLen = huffmanLengths(bFreq)
    val aLen = huffmanLengths(aFreq)
    val dLen = new Array[Int](40) // unused distance tree
    writePrefixCode(w, gLen)
    writePrefixCode(w, rLen)
    writePrefixCode(w, bLen)
    writePrefixCode(w, aLen)
    writePrefixCode(w, dLen)
    val gC = pixelCodes(gLen); val rC = pixelCodes(rLen)
    val bC = pixelCodes(bLen); val aC = pixelCodes(aLen)
    px.foreach { p =>
      val (gc, gl) = gC((p >> 8) & 0xFF); writeCodeMsb(w, gc, gl)
      val (rc, rl) = rC((p >> 16) & 0xFF); writeCodeMsb(w, rc, rl)
      val (bc, bl) = bC(p & 0xFF); writeCodeMsb(w, bc, bl)
      val (ac, al) = aC((p >>> 24) & 0xFF); writeCodeMsb(w, ac, al)
    }
  }

  /** Test hook: the predictor function, mode −1/−2/−3 = edge rules. */
  private[operators] def predictForTest(mode: Int, px: Array[Int], i: Int,
      x: Int, y: Int, xs: Int): Int = predict(mode, px, i, x, y, xs)

  /** RIFF/WEBP/VP8L container around a raw VP8L bitstream payload
    * (everything after the 0x2F signature byte).
    */
  private[operators] def wrapContainer(payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val vp8lSize = payload.length + 1 // + signature byte
    val padded = vp8lSize + (vp8lSize & 1)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + 8 + padded))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8L".getBytes("US-ASCII"))
    out.write(le32(vp8lSize))
    out.write(0x2F)
    out.write(payload)
    if ((vp8lSize & 1) == 1) out.write(0)
    out.toByteArray
  }
}
