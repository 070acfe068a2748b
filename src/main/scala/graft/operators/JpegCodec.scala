package graft.operators

/** JPEG decode (ITU-T T.81 — sequential baseline AND progressive DCT,
  * Huffman) — the format hub image corpora overwhelmingly ship in.
  * From-spec, pure Scala, like the sibling [[Vp8lCodec]]/[[FlacCodec]]:
  *
  *  - marker segments: SOI, APPn/COM (skipped), DQT (8/16-bit tables,
  *    zig-zag order), SOF0/SOF1 (baseline + extended sequential
  *    Huffman — same decode), DHT (canonical code assembly per Annex
  *    C), DRI, SOS, EOI;
  *  - entropy decode: bit-serial Huffman per Annex F (mincode /
  *    maxcode / valptr), byte-stuffing (FF 00), restart markers
  *    (byte realign + DC predictor reset every DRI MCUs);
  *  - block reconstruction: DC prediction + EXTEND sign recovery,
  *    ZRL/EOB run semantics, dequantization, the reference float
  *    separable IDCT (exact for the uniform blocks the oracle plants;
  *    within ±1 of any conforming decoder elsewhere), level shift +
  *    clamp;
  *  - sampling: arbitrary H/V factors 1..4 with nearest-neighbor
  *    chroma upsampling (T.81 leaves the filter to the decoder;
  *    uniform chroma planes reconstruct exactly under any filter);
  *  - color: 1-component grayscale, 3-component JFIF YCbCr (BT.601
  *    inverse, rounded + clamped), and 4-component Adobe CMYK/YCCK
  *    (APP14 transform flag; inverted-sample multiply — the
  *    libjpeg/browser rendering, see [[assemble]]).
  *
  * Progressive (SOF2) decodes via [[decodeProgressive]] — Annex G
  * spectral selection + successive approximation accumulated per
  * block, one IDCT pass at EOI.
  *
  * 12-bit samples (SOF1 extended sequential — the medical/archival
  * precision) decode with level shift 2048 and clamp 4095, rendering
  * the top byte into the 8-bit ARGB output.
  *
  * Honest subset, quarantined loudly (None, never a misread):
  * arithmetic coding (SOF9+), hierarchical, 12-bit progressive, and
  * progressive 4-component files (sequential CMYK and 12-bit decode;
  * those progressive combinations are vanishingly rare in crawl
  * corpora).
  *
  * Witnesses: the JDK's ImageIO JPEG decoder — an INDEPENDENT
  * implementation — must agree within the spec's IDCT tolerance on
  * random images (JpegCodecSpec), and uniform-8×8-block fixtures at
  * quantization 1 are LOSSLESS by construction (DC = 8·(v−128) is an
  * exact integer, every AC is 0), which is what gives `q_jpeg_decode`
  * a closed-form DuckDB oracle despite JPEG being lossy in general.
  *
  * Scale shape: one image per row inside `mapPartitions` —
  * bytes-linear, scan-local, zero shuffle before the caller's
  * aggregate.
  */
object JpegCodec {

  /** Decoded image: ARGB row-major (grayscale replicates Y). */
  final case class Decoded(width: Int, height: Int, nComp: Int,
      argb: Array[Int])

  // zig-zag scan position -> natural (row-major) coefficient index
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  // c(u)·cos((2x+1)uπ/16) — the reference IDCT basis, u=0 scaled 1/√2
  private val CosTab: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ----------------------------------------------------------- huffman

  /** Canonical Huffman table per T.81 Annex C/F. */
  private final class Huff(counts: Array[Int], val vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l)
        k += counts(l)
        maxCode(l) = if (counts(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0

    /** Next entropy bit; FF 00 stuffing unwrapped; a bare marker here
      * means truncated data (quarantine).
      */
    def bit(): Int = {
      if (cnt == 0) {
        require(pos < b.length, "jpeg: entropy data truncated")
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          require(pos < b.length, "jpeg: truncated at FF")
          val m = b(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed literal FF
          else throw new IllegalArgumentException(f"jpeg: marker FF$m%02x inside scan")
          v = 0xff
        }
        cur = v
        cnt = 8
      }
      cnt -= 1
      (cur >> cnt) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(h: Huff): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (h.maxCode(l) >= 0 && code <= h.maxCode(l) && code >= h.minCode(l))
          return h.vals(h.valPtr(l) + code - h.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalArgumentException("jpeg: invalid huffman code")
    }

    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      require(pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        (b(pos + 1) & 0xff) == (0xd0 + (n & 7)),
        "jpeg: missing restart marker")
      pos += 2
    }
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  // ------------------------------------------------------------- model

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0 // DC table id (from SOS)
    var ta = 0 // AC table id
  }

  // -------------------------------------------------------------- idct

  /** Reference separable float IDCT; writes level-shifted clamped
    * samples into `out` at (ox, oy) with row `stride`. `precision` is
    * the frame sample precision (T.81 P): 8-bit writes samples as-is;
    * 12-bit level-shifts by 2048, clamps to [0, 4095], and stores the
    * TOP byte (>> 4) — the standard display downscale, documented on
    * [[Decoded]] (ARGB is 8-bit per channel).
    */
  private def idctBlock(coef: Array[Int], out: Array[Byte], ox: Int, oy: Int,
      stride: Int, outW: Int, outH: Int, precision: Int = 8): Unit = {
    val shift = 1 << (precision - 1)
    val maxV = (1 << precision) - 1
    val down = precision - 8
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += coef(v * 8 + u) * CosTab(x)(u); u += 1 }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      val py = oy + y
      var x = 0
      while (x < 8) {
        val px = ox + x
        if (px < outW && py < outH) {
          var s = 0.0
          var vv = 0
          while (vv < 8) { s += tmp(vv * 8 + x) * CosTab(y)(vv); vv += 1 }
          val p = math.round(0.25 * s).toInt + shift
          val c = if (p < 0) 0 else if (p > maxV) maxV else p
          out(py * stride + px) = (c >> down).toByte
        }
        x += 1
      }
      y += 1
    }
  }

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try {
      require(bytes != null && bytes.length > 4, "jpeg: too small")
      require((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "jpeg: no SOI")
      var p = 2
      def u8(i: Int) = bytes(i) & 0xff
      def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
      val qtabs = new Array[Array[Int]](4) // natural order
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var comps: Array[Comp] = null
      var width = 0
      var height = 0
      var precision = 8
      var restartInterval = 0
      var adobeTransform = -1 // APP14 color transform; -1 = no marker
      var sosAt = -1
      var done = false
      while (!done) {
        require(p + 1 < bytes.length, "jpeg: truncated before SOS")
        require(u8(p) == 0xff, f"jpeg: expected marker at $p")
        var m = u8(p + 1)
        p += 2
        while (m == 0xff) { m = u8(p); p += 1 } // fill bytes
        m match {
          case 0xd9 => throw new IllegalArgumentException("jpeg: EOI before scan")
          case 0x01 => () // TEM, standalone
          case mk if mk >= 0xd0 && mk <= 0xd7 => () // stray RST
          case 0xdb => // DQT
            val len = u16(p); val end = p + len
            var q = p + 2
            while (q < end) {
              val pq = u8(q) >> 4; val tq = u8(q) & 15
              require(pq <= 1 && tq < 4, "jpeg: bad DQT")
              q += 1
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(ZigZag(k)) = if (pq == 0) u8(q + k) else u16(q + 2 * k)
                k += 1
              }
              q += (if (pq == 0) 64 else 128)
              qtabs(tq) = tab
            }
            p = end
          case 0xc4 => // DHT
            val len = u16(p); val end = p + len
            var q = p + 2
            while (q < end) {
              val tc = u8(q) >> 4; val th = u8(q) & 15
              require(tc <= 1 && th < 4, "jpeg: bad DHT")
              val counts = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { counts(l) = u8(q + l); total += counts(l); l += 1 }
              val vals = Array.tabulate(total)(i => u8(q + 17 + i))
              val h = new Huff(counts, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              q += 17 + total
            }
            p = end
          case mk @ (0xc0 | 0xc1) => // SOF0 baseline / SOF1 ext. sequential
            val len = u16(p)
            precision = u8(p + 2)
            // T.81: baseline is 8-bit by definition; extended sequential
            // (SOF1) allows 12-bit samples (medical/archival corpora)
            require(precision == 8 || (precision == 12 && mk == 0xc1),
              s"jpeg: $precision-bit precision unsupported for SOF${mk - 0xc0}")
            height = u16(p + 3); width = u16(p + 5)
            require(width > 0 && height > 0, "jpeg: zero dimension")
            // Allocation guard (the XzCodec 1 GiB rule): SOF dims are
            // attacker-controlled u16s — a crafted 65k×65k header would
            // otherwise allocate ~17 GB of ARGB before any entropy data
            // is read, and OutOfMemoryError is an Error, so it would
            // ESCAPE the catch-all quarantine and kill the executor.
            // 2^26 px (8192×8192) bounds out[] at 256 MB and each padded
            // MCU plane (≤(w+32)(h+32) bytes at 4:1:1 sampling) well
            // under the same budget; larger images quarantine as None.
            require(width.toLong * height <= (1L << 26),
              "jpeg: image over 64M-pixel allocation cap")
            val nf = u8(p + 7)
            require(nf == 1 || nf == 3 || nf == 4,
              s"jpeg: $nf components unsupported")
            comps = Array.tabulate(nf) { i =>
              val q = p + 8 + 3 * i
              val c = Comp(u8(q), u8(q + 1) >> 4, u8(q + 1) & 15, u8(q + 2))
              require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "jpeg: bad sampling")
              c
            }
            p += len
          case 0xc2 => return decodeProgressive(bytes)
          case mk if mk >= 0xc3 && mk <= 0xcf && mk != 0xc4 && mk != 0xc8 =>
            throw new IllegalArgumentException(f"jpeg: SOF $mk%02x unsupported")
          case 0xee => // APP14: Adobe color-transform flag (0=none/CMYK,
            // 1=YCbCr, 2=YCCK) — the marker every real CMYK JPEG carries
            val len = u16(p)
            if (len >= 14 && u8(p + 2) == 'A' && u8(p + 3) == 'd' &&
              u8(p + 4) == 'o' && u8(p + 5) == 'b' && u8(p + 6) == 'e')
              adobeTransform = u8(p + 13)
            p += len
          case 0xdd => // DRI
            restartInterval = u16(p + 2)
            p += u16(p)
          case 0xda => // SOS
            require(comps != null, "jpeg: SOS before SOF")
            val ns = u8(p + 2)
            require(ns == comps.length, "jpeg: partial scans unsupported")
            var i = 0
            while (i < ns) {
              val cs = u8(p + 3 + 2 * i)
              val c = comps.find(_.id == cs).getOrElse(
                throw new IllegalArgumentException("jpeg: SOS component not in SOF"))
              c.td = u8(p + 4 + 2 * i) >> 4
              c.ta = u8(p + 4 + 2 * i) & 15
              i += 1
            }
            sosAt = p + u16(p)
            done = true
          case _ => // APPn, COM, anything sized: skip by length
            p += u16(p)
        }
      }

      // plane geometry
      val hMax = comps.map(_.h).max
      val vMax = comps.map(_.v).max
      val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
      val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
      val planes = comps.map { c =>
        new Array[Byte](mcusX * c.h * 8 * mcusY * c.v * 8)
      }
      val strides = comps.map(c => mcusX * c.h * 8)
      val planeH = comps.map(c => mcusY * c.v * 8)

      val r = new BitReader(bytes, sosAt)
      val dcPred = new Array[Int](comps.length)
      var rstCount = 0
      var rstIdx = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (restartInterval > 0 && rstCount == restartInterval) {
            r.restart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            rstCount = 0
            java.util.Arrays.fill(dcPred, 0)
          }
          var ci = 0
          while (ci < comps.length) {
            val c = comps(ci)
            val dcT = dcTabs(c.td); val acT = acTabs(c.ta)
            val q = qtabs(c.tq)
            require(dcT != null && acT != null && q != null, "jpeg: missing table")
            var by = 0
            while (by < c.v) {
              var bx = 0
              while (bx < c.h) {
                val coef = new Array[Int](64)
                val s = r.decode(dcT)
                require(s <= 15, "jpeg: bad DC category")
                dcPred(ci) += extend(r.bits(s), s)
                coef(0) = dcPred(ci) * q(0)
                var k = 1
                while (k < 64) {
                  val rs = r.decode(acT)
                  val run = rs >> 4; val sz = rs & 15
                  if (sz == 0) {
                    if (run == 15) k += 16 // ZRL
                    else k = 64 // EOB
                  } else {
                    k += run
                    require(k < 64, "jpeg: AC run past block")
                    val nat = ZigZag(k)
                    coef(nat) = extend(r.bits(sz), sz) * q(nat)
                    k += 1
                  }
                }
                idctBlock(coef, planes(ci),
                  (mx * c.h + bx) * 8, (my * c.v + by) * 8,
                  strides(ci), strides(ci), planeH(ci), precision)
                bx += 1
              }
              by += 1
            }
            ci += 1
          }
          rstCount += 1
          mx += 1
        }
        my += 1
      }

      Some(Decoded(width, height, comps.length,
        assemble(width, height, comps, planes, strides, hMax, vMax,
          adobeTransform)))
    } catch { case _: Exception => None }
  }

  /** Upsample + color-convert decoded planes into ARGB (shared by the
    * sequential and progressive paths). `adobeTransform` is the APP14
    * flag; it only matters for 4-component (CMYK-family) frames.
    */
  private def assemble(width: Int, height: Int, comps: Array[Comp],
      planes: Array[Array[Byte]], strides: Array[Int],
      hMax: Int, vMax: Int, adobeTransform: Int = -1): Array[Int] = {
    val out = new Array[Int](width * height)
    if (comps.length == 1) {
      val pl = planes(0); val st = strides(0)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = pl(y * st + x) & 0xff
          out(y * width + x) = 0xff000000 | (g << 16) | (g << 8) | g
          x += 1
        }
        y += 1
      }
    } else {
      def cl(d: Double): Int = {
        val v = math.round(d).toInt
        if (v < 0) 0 else if (v > 255) 255 else v
      }
      // per-component upsampled sample at (x, y)
      def sample(ci: Int, x: Int, y: Int): Int = {
        val c = comps(ci)
        planes(ci)((y * c.v / vMax) * strides(ci) + x * c.h / hMax) & 0xff
      }
      if (comps.length == 4) {
        // Adobe 4-component (CMYK family): samples are INVERTED CMYK
        // (255 = no ink), the convention every real CMYK JPEG follows;
        // APP14 transform 2 (YCCK) additionally routes the first three
        // planes through the YCbCr transform. Output is the
        // domain-standard inverted multiply R = c'·k'/255
        // (libjpeg/browser rendering) — deliberately NOT the JDK
        // reader's gamma-managed colorimetric variant, so the spec's
        // foreign witness checks the entropy/IDCT layer via readRaster
        // and the color step against this closed form.
        val ycck = adobeTransform == 2
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val s0 = sample(0, x, y); val s1 = sample(1, x, y)
            val s2 = sample(2, x, y); val k = sample(3, x, y)
            var c0 = s0.toDouble; var m0 = s1.toDouble; var y0 = s2.toDouble
            if (ycck) {
              val b0 = s1 - 128; val r0 = s2 - 128
              c0 = cl(s0 + 1.402 * r0).toDouble
              m0 = cl(s0 - 0.344136 * b0 - 0.714136 * r0).toDouble
              y0 = cl(s0 + 1.772 * b0).toDouble
            }
            val rr = cl(c0 * k / 255.0)
            val gg = cl(m0 * k / 255.0)
            val bb = cl(y0 * k / 255.0)
            out(y * width + x) = 0xff000000 | (rr << 16) | (gg << 8) | bb
            x += 1
          }
          y += 1
        }
      } else if (adobeTransform == 0) {
        // Adobe APP14 transform 0 with 3 components: the samples ARE
        // RGB (Photoshop emits these) — running them through the YCbCr
        // inverse would be a silent color misread, against the
        // decode-or-quarantine contract. Copy the planes directly.
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            out(y * width + x) = 0xff000000 | (sample(0, x, y) << 16) |
              (sample(1, x, y) << 8) | sample(2, x, y)
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val yy = sample(0, x, y)
            val b0 = sample(1, x, y) - 128
            val r0 = sample(2, x, y) - 128
            val rr = cl(yy + 1.402 * r0)
            val gg = cl(yy - 0.344136 * b0 - 0.714136 * r0)
            val bb = cl(yy + 1.772 * b0)
            out(y * width + x) = 0xff000000 | (rr << 16) | (gg << 8) | bb
            x += 1
          }
          y += 1
        }
      }
    }
    out
  }

  // -------------------------------------------------------- progressive

  /** Progressive JPEG (SOF2) — T.81 Annex G spectral selection +
    * successive approximation over the same Huffman/IDCT machinery:
    * coefficients accumulate per block across scans (DC first/refine,
    * AC first with EOB runs, AC refinement with correction bits), and
    * ONE dequantize + IDCT pass reconstructs the planes after EOI.
    * Real hub image corpora are majority-progressive, so this is the
    * format's main path, not an exotic one.
    *
    * Non-interleaved scans (ns = 1 — mandatory for AC) traverse the
    * component's OWN ceil(w·h/hMax/8)-block grid; interleaved DC scans
    * traverse the MCU grid. Restart markers byte-align, reset DC
    * predictors AND the EOB run.
    */
  private def decodeProgressive(bytes: Array[Byte]): Option[Decoded] = {
    try {
      var p = 2
      def u8(i: Int) = bytes(i) & 0xff
      def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
      val qtabs = new Array[Array[Int]](4)
      val dcTabs = new Array[Huff](4)
      val acTabs = new Array[Huff](4)
      var comps: Array[Comp] = null
      var width = 0
      var height = 0
      var restartInterval = 0
      var hMax = 0; var vMax = 0
      var mcusX = 0; var mcusY = 0
      var blocksW: Array[Int] = null // padded (MCU-grid) block dims
      var blocksH: Array[Int] = null
      var compBW: Array[Int] = null // non-interleaved grid dims
      var compBH: Array[Int] = null
      var coefs: Array[Array[Int]] = null // per comp: blocks × 64, natural order

      /** One entropy-coded scan; returns the position after its data. */
      def decodeScan(scanCis: Array[Int], ss: Int, se: Int, ah: Int,
          al: Int, start: Int): Int = {
        val r = new BitReader(bytes, start)
        val dcPred = new Array[Int](comps.length)
        var eobrun = 0
        var rstIdx = 0
        var sinceRst = 0
        def maybeRestart(): Unit =
          if (restartInterval > 0 && sinceRst == restartInterval) {
            r.restart(rstIdx)
            rstIdx = (rstIdx + 1) & 7
            sinceRst = 0
            java.util.Arrays.fill(dcPred, 0)
            eobrun = 0
          }
        def dcBlock(ci: Int, base: Int): Unit =
          if (ah == 0) {
            val t = dcTabs(comps(ci).td)
            require(t != null, "jpeg: missing DC table")
            val s = r.decode(t)
            require(s <= 15, "jpeg: bad DC category")
            dcPred(ci) += extend(r.bits(s), s)
            coefs(ci)(base) = dcPred(ci) << al
          } else { // refinement: one raw bit per block
            if (r.bit() == 1) coefs(ci)(base) |= (1 << al)
          }
        def acFirst(ci: Int, base: Int): Unit = {
          val t = acTabs(comps(ci).ta)
          require(t != null, "jpeg: missing AC table")
          if (eobrun > 0) { eobrun -= 1; return }
          var k = ss
          while (k <= se) {
            val rs = r.decode(t)
            val run = rs >> 4; val s = rs & 15
            if (s == 0) {
              if (run == 15) k += 16 // ZRL
              else {
                eobrun = (1 << run) - 1 + (if (run > 0) r.bits(run) else 0)
                k = se + 1
              }
            } else {
              k += run
              require(k <= se, "jpeg: AC run past band")
              coefs(ci)(base + ZigZag(k)) = extend(r.bits(s), s) << al
              k += 1
            }
          }
        }
        def acRefine(ci: Int, base: Int): Unit = {
          val t = acTabs(comps(ci).ta)
          require(t != null, "jpeg: missing AC table")
          val p1 = 1 << al
          val m1 = -1 << al
          def correct(nat: Int): Unit =
            if (r.bit() == 1 && (coefs(ci)(base + nat) & p1) == 0)
              coefs(ci)(base + nat) +=
                (if (coefs(ci)(base + nat) >= 0) p1 else m1)
          var k = ss
          if (eobrun == 0) {
            var inBand = true
            while (inBand && k <= se) {
              val rs = r.decode(t)
              var run = rs >> 4; val s = rs & 15
              var value = 0
              if (s == 0) {
                if (run < 15) {
                  // NO −1 here (unlike acFirst): the EOB phase below
                  // handles the CURRENT block too and decrements then
                  eobrun = (1 << run) + (if (run > 0) r.bits(run) else 0)
                  inBand = false
                } // run == 15: skip 16 zero-history coeffs, corrections en route
              } else {
                require(s == 1, "jpeg: refinement size != 1")
                value = if (r.bit() == 1) p1 else m1
              }
              if (inBand) {
                var placed = false
                while (!placed && k <= se) {
                  val nat = ZigZag(k)
                  if (coefs(ci)(base + nat) != 0) correct(nat)
                  else if (run == 0) {
                    if (value != 0) coefs(ci)(base + nat) = value
                    placed = true
                  } else run -= 1
                  k += 1
                }
                require(placed || value == 0, "jpeg: refinement past band")
              }
            }
          }
          if (eobrun > 0) { // EOB phase: corrections for the rest of the band
            while (k <= se) {
              val nat = ZigZag(k)
              if (coefs(ci)(base + nat) != 0) correct(nat)
              k += 1
            }
            eobrun -= 1
          }
        }
        def block(ci: Int, base: Int): Unit =
          if (ss == 0) dcBlock(ci, base) else acFirst(ci, base)

        if (scanCis.length > 1) {
          // interleaved (DC only): MCU traversal over the padded grid
          require(ss == 0 && se == 0, "jpeg: interleaved AC scan")
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              maybeRestart()
              scanCis.foreach { ci =>
                val c = comps(ci)
                var by = 0
                while (by < c.v) {
                  var bx = 0
                  while (bx < c.h) {
                    val row = my * c.v + by; val col = mx * c.h + bx
                    block(ci, (row * blocksW(ci) + col) * 64)
                    bx += 1
                  }
                  by += 1
                }
              }
              sinceRst += 1
              mx += 1
            }
            my += 1
          }
        } else {
          // non-interleaved: the component's own block grid, row-major
          val ci = scanCis(0)
          val wB = compBW(ci); val hB = compBH(ci)
          var row = 0
          while (row < hB) {
            var col = 0
            while (col < wB) {
              maybeRestart()
              val base = (row * blocksW(ci) + col) * 64
              if (ss == 0) dcBlock(ci, base)
              else if (ah == 0) acFirst(ci, base)
              else acRefine(ci, base)
              sinceRst += 1
              col += 1
            }
            row += 1
          }
        }
        // skip any trailing bits/RSTs to the next real marker
        var q = r.pos
        while (q + 1 < bytes.length && !((bytes(q) & 0xff) == 0xff && {
          val mm = bytes(q + 1) & 0xff
          mm != 0 && !(mm >= 0xd0 && mm <= 0xd7)
        })) q += 1
        q
      }

      var done = false
      while (!done) {
        require(p + 1 < bytes.length, "jpeg: truncated before EOI")
        require(u8(p) == 0xff, f"jpeg: expected marker at $p")
        var m = u8(p + 1)
        p += 2
        while (m == 0xff) { m = u8(p); p += 1 }
        m match {
          case 0xd9 => done = true // EOI
          case 0x01 => ()
          case mk if mk >= 0xd0 && mk <= 0xd7 => ()
          case 0xdb => // DQT (same grammar as the sequential path)
            val len = u16(p); val end = p + len
            var q = p + 2
            while (q < end) {
              val pq = u8(q) >> 4; val tq = u8(q) & 15
              require(pq <= 1 && tq < 4, "jpeg: bad DQT")
              q += 1
              val tab = new Array[Int](64)
              var k = 0
              while (k < 64) {
                tab(ZigZag(k)) = if (pq == 0) u8(q + k) else u16(q + 2 * k)
                k += 1
              }
              q += (if (pq == 0) 64 else 128)
              qtabs(tq) = tab
            }
            p = end
          case 0xc4 => // DHT
            val len = u16(p); val end = p + len
            var q = p + 2
            while (q < end) {
              val tc = u8(q) >> 4; val th = u8(q) & 15
              require(tc <= 1 && th < 4, "jpeg: bad DHT")
              val counts = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { counts(l) = u8(q + l); total += counts(l); l += 1 }
              val vals = Array.tabulate(total)(i => u8(q + 17 + i))
              val h = new Huff(counts, vals)
              if (tc == 0) dcTabs(th) = h else acTabs(th) = h
              q += 17 + total
            }
            p = end
          case 0xc2 => // SOF2
            val len = u16(p)
            require(comps == null, "jpeg: second frame")
            require(u8(p + 2) == 8, "jpeg: 12-bit precision unsupported")
            height = u16(p + 3); width = u16(p + 5)
            require(width > 0 && height > 0, "jpeg: zero dimension")
            // tighter cap than sequential: the coefficient store costs
            // 256 B/block vs the plane's 64, so bound at 2^24 px
            // (4096×4096 — beyond any sane web image) to keep worst-case
            // 4:4:4 coefficient memory ~200 MB
            require(width.toLong * height <= (1L << 24),
              "jpeg: progressive image over 16M-pixel allocation cap")
            val nf = u8(p + 7)
            require(nf == 1 || nf == 3, s"jpeg: $nf components unsupported")
            comps = Array.tabulate(nf) { i =>
              val q = p + 8 + 3 * i
              val c = Comp(u8(q), u8(q + 1) >> 4, u8(q + 1) & 15, u8(q + 2))
              require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4, "jpeg: bad sampling")
              c
            }
            hMax = comps.map(_.h).max
            vMax = comps.map(_.v).max
            mcusX = (width + 8 * hMax - 1) / (8 * hMax)
            mcusY = (height + 8 * vMax - 1) / (8 * vMax)
            blocksW = comps.map(c => mcusX * c.h)
            blocksH = comps.map(c => mcusY * c.v)
            compBW = comps.map(c => ((width * c.h + hMax - 1) / hMax + 7) / 8)
            compBH = comps.map(c => ((height * c.v + vMax - 1) / vMax + 7) / 8)
            coefs = comps.indices.map(i =>
              new Array[Int](blocksW(i) * blocksH(i) * 64)).toArray
            p += len
          case 0xc0 | 0xc1 =>
            throw new IllegalArgumentException("jpeg: mixed frame types")
          case mk if mk >= 0xc3 && mk <= 0xcf && mk != 0xc4 && mk != 0xc8 =>
            throw new IllegalArgumentException(f"jpeg: SOF $mk%02x unsupported")
          case 0xdd => // DRI
            restartInterval = u16(p + 2)
            p += u16(p)
          case 0xda => // SOS: decode this scan, continue the marker loop
            require(comps != null, "jpeg: SOS before SOF")
            val ns = u8(p + 2)
            require(ns >= 1 && ns <= comps.length, "jpeg: bad scan component count")
            val scanCis = Array.tabulate(ns) { i =>
              val cs = u8(p + 3 + 2 * i)
              val ci = comps.indexWhere(_.id == cs)
              require(ci >= 0, "jpeg: SOS component not in SOF")
              comps(ci).td = u8(p + 4 + 2 * i) >> 4
              comps(ci).ta = u8(p + 4 + 2 * i) & 15
              ci
            }
            val ss = u8(p + 3 + 2 * ns)
            val se = u8(p + 4 + 2 * ns)
            val ahAl = u8(p + 5 + 2 * ns)
            val ah = ahAl >> 4; val al = ahAl & 15
            require(ss <= 63 && se <= 63 && ss <= se, "jpeg: bad spectral band")
            require(ss == 0 || ns == 1, "jpeg: interleaved AC scan")
            require(ss > 0 || se == 0, "jpeg: DC scan with AC band")
            p = decodeScan(scanCis, ss, se, ah, al, p + u16(p))
          case _ => p += u16(p)
        }
      }
      require(comps != null, "jpeg: no frame")

      // one dequantize + IDCT pass over the accumulated coefficients
      val planes = comps.indices.map(i =>
        new Array[Byte](blocksW(i) * 8 * blocksH(i) * 8)).toArray
      val strides = comps.indices.map(i => blocksW(i) * 8).toArray
      comps.indices.foreach { ci =>
        val q = qtabs(comps(ci).tq)
        require(q != null, "jpeg: missing quant table")
        val cf = new Array[Int](64)
        var row = 0
        while (row < blocksH(ci)) {
          var col = 0
          while (col < blocksW(ci)) {
            val base = (row * blocksW(ci) + col) * 64
            var k = 0
            while (k < 64) { cf(k) = coefs(ci)(base + k) * q(k); k += 1 }
            idctBlock(cf, planes(ci), col * 8, row * 8,
              strides(ci), strides(ci), blocksH(ci) * 8)
            col += 1
          }
          row += 1
        }
      }
      Some(Decoded(width, height, comps.length,
        assemble(width, height, comps, planes, strides, hMax, vMax)))
    } catch { case e: Exception =>
      if (sys.env.contains("GRAFT_JPEG_DEBUG")) e.printStackTrace()
      None
    }
  }

  // ---------------------------------------------------------- fixtures

  /** Grayscale uniform-8×8-block fixture, ImageIO-encoded (a FOREIGN
    * encoder) at quality 1.0 — all-ones quantization tables, so the
    * DC-only uniform blocks are LOSSLESS and the decode equals the
    * planted values exactly, the property `q_jpeg_decode`'s SQL
    * oracle relies on. `cell(i, j)` gives the block value.
    */
  def uniformBlockFixture(blocksW: Int, blocksH: Int,
      cell: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      blocksW * 8, blocksH * 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var j = 0
    while (j < blocksH) {
      var i = 0
      while (i < blocksW) {
        val v = cell(i, j) & 0xff
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) { raster.setSample(i * 8 + x, j * 8 + y, 0, v); x += 1 }
          y += 1
        }
        i += 1
      }
      j += 1
    }
    encodeImageIO(img, 1.0f)
  }

  /** Hand-assembled 12-bit grayscale SOF1 fixture: uniform 8×8 blocks,
    * all-ones 16-bit DQT, DC-only entropy data — lossless by the same
    * Q=1 argument as [[uniformBlockFixture]] (DC = 8·(v−2048) is an
    * exact integer, every AC is 0), so the decode equals
    * `cell(i,j) >> 4` exactly (12-bit samples render their top byte —
    * see [[idctBlock]]). Assembled from T.81 directly because NO
    * foreign 12-bit encoder ships with the JDK (its ImageIO writer is
    * 8-bit only); the DC table is sixteen 5-bit codes (categories
    * 0-15, value = code, the all-ones word unused per the standard)
    * and the AC table one 2-bit EOB code.
    */
  def uniformBlock12Fixture(blocksW: Int, blocksH: Int,
      cell: (Int, Int) => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int*): Unit = v.foreach(x => out.write(x & 0xff))
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    b(0xFF, 0xD8) // SOI
    b(0xFF, 0xDB); u16(2 + 1 + 128); b(0x10) // DQT pq=1 tq=0, all ones
    (0 until 64).foreach(_ => u16(1))
    b(0xFF, 0xC1); u16(11); b(12); u16(blocksH * 8); u16(blocksW * 8)
    b(1, 1, 0x11, 0) // one component, 1x1 sampling, q-table 0
    b(0xFF, 0xC4); u16(2 + 1 + 16 + 16); b(0x00) // DHT DC 0
    (1 to 16).foreach(l => out.write(if (l == 5) 16 else 0))
    (0 until 16).foreach(out.write)
    b(0xFF, 0xC4); u16(2 + 1 + 16 + 1); b(0x10) // DHT AC 0: EOB only
    (1 to 16).foreach(l => out.write(if (l == 2) 1 else 0))
    out.write(0x00)
    b(0xFF, 0xDA); u16(8); b(1, 1, 0x00, 0, 63, 0) // SOS
    // entropy: per block, 5-bit DC category code + magnitude + 2-bit EOB
    var acc = 0; var nb = 0
    val ent = scala.collection.mutable.ArrayBuffer.empty[Byte]
    def putBits(v: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        acc = (acc << 1) | ((v >> k) & 1); nb += 1
        if (nb == 8) {
          ent += acc.toByte
          if ((acc & 0xff) == 0xff) ent += 0x00.toByte // FF stuffing
          acc = 0; nb = 0
        }
        k -= 1
      }
    }
    var pred = 0
    var j = 0
    while (j < blocksH) {
      var i = 0
      while (i < blocksW) {
        val dc = 8 * ((cell(i, j) & 0xfff) - 2048)
        val diff = dc - pred
        pred = dc
        val s =
          if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        putBits(s, 5)
        if (s > 0) putBits(if (diff < 0) diff + (1 << s) - 1 else diff, s)
        putBits(0, 2) // EOB
        i += 1
      }
      j += 1
    }
    if (nb > 0) { // pad the tail byte with 1-bits per F.1.2.3
      acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
      ent += acc.toByte
      if ((acc & 0xff) == 0xff) ent += 0x00.toByte
    }
    out.write(ent.toArray)
    b(0xFF, 0xD9)
    out.toByteArray
  }

  /** ImageIO JPEG encode at the given quality (the independent-encoder
    * seam the specs and fixtures share).
    */
  def encodeImageIO(img: java.awt.image.BufferedImage, quality: Float): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = w.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); w.dispose()
    bos.toByteArray
  }
}
