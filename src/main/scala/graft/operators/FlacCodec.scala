package graft.operators

/** Pure-JVM FLAC codec — retires one more stub from the media seam
  * ([[Multimodal]] scaladoc): the JDK's `javax.sound.sampled` has no
  * FLAC support, so this implements the container from the public
  * bitstream spec (RFC 9639): STREAMINFO parsing, frame headers with
  * CRC-8, subframe types CONSTANT / VERBATIM / FIXED (orders 0–4) /
  * LPC (orders 1–32, any coefficient precision) with Rice-coded
  * residual partitions (both 4- and 5-bit parameter widths, escape
  * partitions included), stereo decorrelation (left/side, side/right,
  * mid/side — the channel assignments encoder-default files actually
  * use), wasted-bits unpacking, and the frame CRC-16. Remaining out of
  * subset, honestly: reserved residual methods return None rather than
  * guess — the documented `decode_ok=false` ladder, same as float PCM
  * in the WAV path. Variable-blocksize streams decode since round 12
  * (per-frame size from the header, sample-number validation).
  *
  * Decoding is integer-exact by construction (FLAC is lossless integer
  * prediction — the LPC accumulator is 64-bit, the side channel carries
  * the parity bit), so decoded samples equal encoder input bit-for-bit
  * — FlacSpec asserts it across every subframe type and stereo mode,
  * and the `q_audio_flac` oracle replays the closed-form sample
  * formula.
  */
object FlacCodec {

  /** Decoded stream: interleaved integer samples + stream parameters. */
  final case class Decoded(
      sampleRate: Int,
      channels: Int,
      bits: Int,
      samples: Array[Int]) // interleaved frame-major, channel-minor

  // ------------------------------------------------------------- bit I/O

  private final class BitReader(bytes: Array[Byte]) {
    var pos = 0 // bit position
    def bytePos: Int = pos >>> 3
    def aligned: Boolean = (pos & 7) == 0
    def remaining: Int = bytes.length * 8 - pos
    def readBit(): Int = {
      val b = (bytes(pos >>> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      b
    }
    /** MSB-first unsigned read, n ≤ 32. */
    def readU(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Signed two's-complement read, n ≤ 32. */
    def readS(n: Int): Int = {
      val u = readU(n)
      if (n == 0) 0
      else if ((u & (1L << (n - 1))) != 0) (u - (1L << n)).toInt
      else u.toInt
    }
    /** Unary: count of 0 bits before the terminating 1. */
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) q += 1
      q
    }
    def alignToByte(): Unit = if (!aligned) pos = (bytePos + 1) << 3
  }

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def writeBit(b: Int): Unit = {
      cur = (cur << 1) | (b & 1)
      nBits += 1
      if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
    }
    def writeU(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { writeBit(((v >>> i) & 1L).toInt); i -= 1 }
    }
    def writeUnary(q: Int): Unit = {
      var i = 0
      while (i < q) { writeBit(0); i += 1 }
      writeBit(1)
    }
    def alignZero(): Unit = while (nBits != 0) writeBit(0)
    def toBytes: Array[Byte] = { require(nBits == 0, "unaligned"); out.toByteArray }
  }

  // --------------------------------------------------------------- CRCs

  /** CRC-8, polynomial x⁸+x²+x+1 (0x07), init 0 — frame-header check. */
  private[operators] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x¹⁶+x¹⁵+x²+1 (0x8005), init 0 — frame check. */
  private[operators] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  private def zigzagDecode(u: Long): Int = ((u >>> 1) ^ -(u & 1L)).toInt
  private def zigzagEncode(v: Int): Long = ((v.toLong << 1) ^ (v.toLong >> 63)) & 0xFFFFFFFFL

  // ------------------------------------------------------------- decode

  /** Decode a FLAC stream (fixed OR variable blocksize); None when the
    * bytes are not FLAC or use a feature outside the subset (reserved
    * residual methods) — the caller's decode_ok=false ladder.
    */
  def decode(bytes: Array[Byte]): Option[Decoded] = {
    try decodeOrThrow(bytes) catch { case _: Exception => None }
  }

  private def decodeOrThrow(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes == null || bytes.length < 42) return None
    if (!(bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'))
      return None
    val r = new BitReader(bytes)
    r.pos = 32
    // metadata blocks; the first MUST be STREAMINFO
    var sampleRate = 0; var channels = 0; var bits = 0; var totalSamples = 0L
    var last = false
    var first = true
    while (!last) {
      last = r.readBit() == 1
      val btype = r.readU(7).toInt
      val len = r.readU(24).toInt
      if (first) {
        if (btype != 0 || len != 34) return None
        r.readU(16); r.readU(16) // min/max block size
        r.readU(24); r.readU(24) // min/max frame size
        sampleRate = r.readU(20).toInt
        channels = r.readU(3).toInt + 1
        bits = r.readU(5).toInt + 1
        totalSamples = r.readU(36)
        var i = 0
        while (i < 16) { r.readU(8); i += 1 } // md5
        first = false
      } else {
        r.pos += len * 8 // skip other metadata
      }
    }
    // bound the PRODUCT, not just the sample count: 2^28 samples × 8
    // channels is 2^31, which would wrap the Int array size below and
    // silently reject a spec-valid stream via the catch-all
    if (totalSamples * channels > (1L << 28)) return None // per-file sanity bound
    val out = new Array[Int]((totalSamples * channels).toInt)
    var written = 0L
    var frameIndex = 0L
    var streamVariable = -1 // blocking strategy of frame 0; spec forbids mixing
    while (written < totalSamples) {
      val frameStart = r.bytePos
      if (r.readU(14) != 0x3FFE) return None // sync
      r.readBit() // reserved
      val variable = r.readBit() // blocking strategy: 1 = variable blocksize
      if (streamVariable < 0) streamVariable = variable
      else if (streamVariable != variable) return None // mixed strategies
      val bsCode = r.readU(4).toInt
      val srCode = r.readU(4).toInt
      val chAsgn = r.readU(4).toInt
      val ssCode = r.readU(3).toInt
      r.readBit() // reserved
      // UTF-8-style coded number: the FRAME index under fixed blocking,
      // the frame's first SAMPLE number under variable — decoded and
      // VALIDATED against the running position (a mismatch means a
      // skipped/duplicated frame the sample copy below would hide)
      val lead = r.readU(8).toInt
      var extra = 0
      var mask = 0x80
      while ((lead & mask) != 0) { extra += 1; mask >>= 1 }
      if (extra == 1 || extra >= 8) return None // 10xxxxxx and 0xFF invalid; 0xFE (36-bit) fine
      var codedNo = if (extra == 0) lead.toLong else (lead & (0x7F >> extra)).toLong
      var i = 0
      while (i < math.max(0, extra - 1)) {
        val c = r.readU(8).toInt
        if ((c & 0xC0) != 0x80) return None // continuation must be 10xxxxxx
        codedNo = (codedNo << 6) | (c & 0x3F)
        i += 1
      }
      if (codedNo != (if (variable == 1) written else frameIndex)) return None
      val blockSize = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readU(8).toInt + 1
        case 7 => r.readU(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => return None
      }
      srCode match {
        case 0 => // from STREAMINFO
        case 12 => r.readU(8)
        case 13 | 14 => r.readU(16)
        case c if c >= 1 && c <= 11 => // table codes carry no extra bits
        case _ => return None
      }
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      // 0–7: independent channels; 8/9/10: stereo decorrelation — the
      // SIDE channel carries one extra bit (it is a difference signal)
      val (nCh, stereoMode) = chAsgn match {
        case c if c <= 7 => (c + 1, 0)
        case 8 => (2, 1) // left/side
        case 9 => (2, 2) // side/right
        case 10 => (2, 3) // mid/side
        case _ => return None
      }
      if (nCh != channels) return None
      def isSide(ch: Int): Boolean = stereoMode match {
        case 1 | 3 => ch == 1
        case 2 => ch == 0
        case _ => false
      }
      val headerEnd = r.bytePos
      val wantCrc8 = r.readU(8).toInt
      if (crc8(bytes, frameStart, headerEnd) != wantCrc8) return None
      val thisBlock = math.min(blockSize.toLong, totalSamples - written).toInt
      if (thisBlock != blockSize) return None // encoder sizes the last frame
      val chans = Array.ofDim[Int](nCh, blockSize)
      var ch = 0
      while (ch < nCh) {
        if (r.readBit() != 0) return None // subframe pad
        val stype = r.readU(6).toInt
        var wasted = 0
        if (r.readBit() == 1) wasted = r.readUnary() + 1
        val bps = frameBits + (if (isSide(ch)) 1 else 0) - wasted
        val s = chans(ch)
        stype match {
          case 0 => // CONSTANT
            val v = r.readS(bps)
            java.util.Arrays.fill(s, v)
          case 1 => // VERBATIM
            var j = 0
            while (j < blockSize) { s(j) = r.readS(bps); j += 1 }
          case t if t >= 8 && t <= 12 => // FIXED, order = t - 8
            val order = t - 8
            var j = 0
            while (j < order) { s(j) = r.readS(bps); j += 1 }
            readResidual(r, blockSize, order, s)
            j = order
            while (j < blockSize) {
              s(j) += (order match {
                case 0 => 0
                case 1 => s(j - 1)
                case 2 => 2 * s(j - 1) - s(j - 2)
                case 3 => 3 * s(j - 1) - 3 * s(j - 2) + s(j - 3)
                case 4 => 4 * s(j - 1) - 6 * s(j - 2) + 4 * s(j - 3) - s(j - 4)
              })
              j += 1
            }
          case t if t >= 32 => // LPC, order = t - 31, any order 1..32
            val order = t - 31
            if (order > blockSize) return None
            var j = 0
            while (j < order) { s(j) = r.readS(bps); j += 1 }
            val precision = r.readU(4).toInt + 1
            if (precision == 16) return None // 0b1111 is invalid per spec
            val shift = r.readS(5)
            if (shift < 0) return None // negative shift is spec-reserved
            val coefs = new Array[Int](order)
            j = 0
            while (j < order) { coefs(j) = r.readS(precision); j += 1 }
            readResidual(r, blockSize, order, s)
            j = order
            while (j < blockSize) {
              // 64-bit accumulator: order ≤ 32 products of (≤32-bit
              // sample × ≤15-bit coefficient) cannot overflow a Long,
              // which is the exact-reconstruction arithmetic the spec
              // prescribes
              var acc = 0L
              var k = 0
              while (k < order) { acc += coefs(k).toLong * s(j - 1 - k); k += 1 }
              s(j) += (acc >> shift).toInt
              j += 1
            }
          case _ => return None // reserved subframe types
        }
        if (wasted > 0) {
          var j = 0
          while (j < blockSize) { s(j) = s(j) << wasted; j += 1 }
        }
        ch += 1
      }
      // undo stereo decorrelation (integer-exact: side = l − r carries
      // the parity bit that reconstructs both channels losslessly)
      if (stereoMode == 1) { // left/side: r = l − side
        var j = 0
        while (j < blockSize) { chans(1)(j) = chans(0)(j) - chans(1)(j); j += 1 }
      } else if (stereoMode == 2) { // side/right: l = side + r
        var j = 0
        while (j < blockSize) { chans(0)(j) = chans(0)(j) + chans(1)(j); j += 1 }
      } else if (stereoMode == 3) { // mid/side
        var j = 0
        while (j < blockSize) {
          val side = chans(1)(j)
          val mid2 = (chans(0)(j) << 1) | (side & 1)
          chans(0)(j) = (mid2 + side) >> 1
          chans(1)(j) = (mid2 - side) >> 1
          j += 1
        }
      }
      r.alignToByte()
      val frameEnd = r.bytePos
      val wantCrc16 = r.readU(16).toInt
      if (crc16(bytes, frameStart, frameEnd) != wantCrc16) return None
      var j = 0
      while (j < blockSize) {
        var c = 0
        while (c < nCh) {
          out(((written + j) * nCh + c).toInt) = chans(c)(j)
          c += 1
        }
        j += 1
      }
      written += blockSize
      frameIndex += 1
    }
    Some(Decoded(sampleRate, channels, bits, out))
  }

  /** Rice-partitioned residual into s(order…blockSize). */
  private def readResidual(r: BitReader, blockSize: Int, order: Int,
      s: Array[Int]): Unit = {
    val method = r.readU(2).toInt
    require(method <= 1, "reserved residual method")
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val po = r.readU(4).toInt
    val nPart = 1 << po
    require(blockSize % nPart == 0, "partition order does not divide block")
    var idx = order
    var p = 0
    while (p < nPart) {
      val count = (blockSize >> po) - (if (p == 0) order else 0)
      val param = r.readU(paramBits).toInt
      if (param == escape) {
        val raw = r.readU(5).toInt
        var j = 0
        while (j < count) { s(idx) = if (raw == 0) 0 else r.readS(raw); idx += 1; j += 1 }
      } else {
        var j = 0
        while (j < count) {
          val q = r.readUnary()
          val rem = r.readU(param)
          s(idx) = zigzagDecode((q.toLong << param) | rem)
          idx += 1; j += 1
        }
      }
      p += 1
    }
  }

  // ------------------------------------------------------------- encode

  /** Fixture encoder: interleaved samples → a valid FLAC stream using
    * one subframe strategy per call — "verbatim", "constant" (requires
    * per-channel-constant input), "fixed2" (order-2 fixed predictor
    * with Rice-coded residuals), or "lpc" (order-8 quantized
    * Levinson–Durbin coefficients, the encoder-default path of real
    * FLAC files; the float autocorrelation only picks WHICH integer
    * coefficients to quantize — reconstruction is integer arithmetic,
    * so the round trip stays bit-exact). `stereo` selects the channel
    * assignment for 2-channel input: "independent" (the historical
    * default), "leftside", "sideright", or "midside" — the
    * decorrelation modes real encoders emit. Exists so FlacSpec and the
    * `q_audio_flac` fixtures exercise genuine encode→decode round trips
    * with independent CRCs; not a tuned encoder.
    *
    * A non-empty `blockSizes` schedule switches the stream to VARIABLE
    * blocksize (RFC 9639 §9.1.1: blocking-strategy bit set, the coded
    * number carries the frame's first SAMPLE number, STREAMINFO min/max
    * describe the schedule) — the blocking real encoders emit around
    * section boundaries; `blockSize` is ignored in that case and the
    * schedule must sum to the sample count per channel.
    */
  def encode(
      samples: Array[Int],
      sampleRate: Int,
      channels: Int,
      bits: Int,
      blockSize: Int = 4096,
      strategy: String = "fixed2",
      stereo: String = "independent",
      blockSizes: Seq[Int] = Nil): Array[Byte] = {
    require(channels >= 1 && channels <= 8, "1..8 channels")
    require(bits >= 4 && bits <= 24, "4..24 bits")
    require(samples.length % channels == 0, "interleave mismatch")
    require(stereo == "independent" || channels == 2,
      s"stereo mode $stereo needs exactly 2 channels")
    val nFrames = samples.length / channels
    val variable = blockSizes.nonEmpty
    if (variable) {
      require(blockSizes.forall(b => b >= 1 && b <= 65536),
        "variable block sizes must be in 1..65536")
      require(blockSizes.map(_.toLong).sum == nFrames,
        s"schedule ${blockSizes.sum} != $nFrames samples/channel")
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    val si = new BitWriter
    si.writeU(1, 1); si.writeU(0, 7); si.writeU(34, 24) // last block, STREAMINFO
    // STREAMINFO min/max must describe the blocks actually emitted (RFC
    // 9639 §8.2, where min EXCLUDES a short last block): a stream
    // shorter than one nominal block has min = max = nFrames; otherwise
    // every non-last frame is nominal, so min = max = blockSize — never
    // the nominal size for a stream that emits no block that long. For
    // a variable schedule, min is over the non-last frames (same
    // exclusion) and max over all; min ≠ max is what MARKS the stream
    // variable-blocksize at the container level.
    val (minB, maxB) =
      if (variable) {
        val body = if (blockSizes.length > 1) blockSizes.init else blockSizes
        (body.min, blockSizes.max)
      } else {
        val emitted = math.min(blockSize, math.max(nFrames, 1))
        (emitted, emitted)
      }
    si.writeU(minB, 16); si.writeU(maxB, 16)
    si.writeU(0, 24); si.writeU(0, 24)
    si.writeU(sampleRate, 20)
    si.writeU(channels - 1, 3)
    si.writeU(bits - 1, 5)
    si.writeU(nFrames, 36)
    (0 until 16).foreach(_ => si.writeU(0, 8)) // md5 unknown
    out.write(si.toBytes)
    var start = 0
    var frameNo = 0L
    val schedule = if (variable) blockSizes.iterator else Iterator.empty
    while (start < nFrames) {
      val bs =
        if (variable) schedule.next()
        else math.min(blockSize, nFrames - start)
      // variable frames are numbered by first sample, fixed by index
      val codedNo = if (variable) start.toLong else frameNo
      out.write(encodeFrame(samples, start, bs, sampleRate, channels, bits,
        codedNo, strategy, stereo, variable))
      start += bs
      frameNo += 1
    }
    out.toByteArray
  }

  /** UTF-8-style coded number (the frame-number field): t-byte form
    * carries 5t+1 payload bits for t ∈ 2..6 and 36 for t = 7; one byte
    * below 2⁷.
    */
  private def writeCodedNumber(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.writeU(v, 8); return }
    val t =
      if (v < (1L << 11)) 2 else if (v < (1L << 16)) 3
      else if (v < (1L << 21)) 4 else if (v < (1L << 26)) 5
      else if (v < (1L << 31)) 6 else 7
    if (t == 7) w.writeU(0xFE, 8)
    else {
      val leadPayload = 7 - t
      val prefix = (0xFF00 >> t) & 0xFF
      w.writeU(prefix | ((v >>> (6 * (t - 1))) & ((1L << leadPayload) - 1)), 8)
    }
    var k = t - 2
    while (k >= 0) {
      w.writeU(0x80L | ((v >>> (6 * k)) & 0x3F), 8)
      k -= 1
    }
  }

  /** One-partition Rice residual write, 4- or 5-bit parameter width
    * chosen by the fitted parameter (the decoder handles both).
    */
  private def writeResidual(w: BitWriter, res: Array[Int]): Unit = {
    val maxZig = res.foldLeft(0L)((m, v) => math.max(m, zigzagEncode(v)))
    var param = 0
    while (param < 30 && (maxZig >>> param) > 30) param += 1
    val method = if (param > 14) 1 else 0
    w.writeU(method, 2)
    w.writeU(0, 4) // partition order 0
    w.writeU(param, if (method == 0) 4 else 5)
    var k = 0
    while (k < res.length) {
      val z = zigzagEncode(res(k))
      w.writeUnary((z >>> param).toInt)
      w.writeU(z & ((1L << param) - 1), param)
      k += 1
    }
  }

  /** Quantized Levinson–Durbin LPC fit: returns (coefs, shift). The
    * double autocorrelation only selects WHICH integer coefficients to
    * emit; reconstruction on both sides is pure integer arithmetic.
    */
  private[operators] def lpcFit(s: Array[Int], order: Int): (Array[Int], Int) = {
    val n = s.length
    // Welch-window the signal before autocorrelation: the UNWINDOWED
    // boundary-truncated lag sums bias the Toeplitz system toward a
    // washed-out predictor (measured mean |residual| 79 vs 1.8 on a
    // 12000-amplitude sine) — windowing first is why the classic
    // autocorrelation method works in real encoders
    val wnd = new Array[Double](n)
    var i = 0
    while (i < n) {
      val t = (i - (n - 1) / 2.0) / ((n + 1) / 2.0)
      wnd(i) = s(i) * (1.0 - t * t)
      i += 1
    }
    val ac = new Array[Double](order + 1)
    var k = 0
    while (k <= order) {
      var sum = 0.0
      i = k
      while (i < n) { sum += wnd(i) * wnd(i - k); i += 1 }
      ac(k) = sum
      k += 1
    }
    val lpc = new Array[Double](order)
    if (ac(0) != 0.0) {
      var err = ac(0)
      var m = 0
      while (m < order && err > 0.0) {
        var acc = ac(m + 1)
        var i = 0
        while (i < m) { acc -= lpc(i) * ac(m - i); i += 1 }
        val reflect = acc / err
        var j = 0
        val half = m / 2
        while (j < half) {
          val tmp = lpc(j)
          lpc(j) = tmp - reflect * lpc(m - 1 - j)
          lpc(m - 1 - j) -= reflect * tmp
          j += 1
        }
        if (m % 2 == 1) lpc(half) -= reflect * lpc(half)
        lpc(m) = reflect
        err *= (1.0 - reflect * reflect)
        m += 1
      }
    }
    val shift = 12
    val coefs = lpc.map { c =>
      val q = math.round(c * (1 << shift)).toInt
      math.max(-(1 << 14), math.min((1 << 14) - 1, q))
    }
    (coefs, shift)
  }

  /** One subframe with the chosen strategy at the channel's bit depth
    * (the side channel of a decorrelated pair arrives with bps+1).
    */
  private def writeSubframe(w: BitWriter, s: Array[Int], bps: Int,
      strategy: String): Unit = {
    val bs = s.length
    strategy match {
      case "constant" =>
        require(s.forall(_ == s(0)), "constant strategy needs constant input")
        w.writeU(0, 1); w.writeU(0, 6); w.writeU(0, 1)
        w.writeU(s(0).toLong & ((1L << bps) - 1), bps)
      case "verbatim" =>
        w.writeU(0, 1); w.writeU(1, 6); w.writeU(0, 1)
        var k = 0
        while (k < bs) { w.writeU(s(k).toLong & ((1L << bps) - 1), bps); k += 1 }
      case "fixed2" =>
        val order = math.min(2, bs - 1) max 0
        w.writeU(0, 1); w.writeU(8 + order, 6); w.writeU(0, 1)
        var k = 0
        while (k < order) { w.writeU(s(k).toLong & ((1L << bps) - 1), bps); k += 1 }
        val res = new Array[Int](bs - order)
        k = order
        while (k < bs) {
          res(k - order) = order match {
            case 0 => s(k)
            case 1 => s(k) - s(k - 1)
            case 2 => s(k) - 2 * s(k - 1) + s(k - 2)
          }
          k += 1
        }
        writeResidual(w, res)
      case "lpc" =>
        val order = math.min(8, bs - 1) max 1
        val (coefs, shift) = lpcFit(s, order)
        w.writeU(0, 1); w.writeU(32 + (order - 1), 6); w.writeU(0, 1)
        var k = 0
        while (k < order) { w.writeU(s(k).toLong & ((1L << bps) - 1), bps); k += 1 }
        w.writeU(14, 4) // precision 15
        w.writeU(shift, 5)
        k = 0
        while (k < order) { w.writeU(coefs(k).toLong & 0x7FFF, 15); k += 1 }
        val res = new Array[Int](bs - order)
        k = order
        while (k < bs) {
          var acc = 0L
          var i = 0
          while (i < order) { acc += coefs(i).toLong * s(k - 1 - i); i += 1 }
          res(k - order) = s(k) - (acc >> shift).toInt
          k += 1
        }
        writeResidual(w, res)
      case other => throw new IllegalArgumentException(s"strategy $other")
    }
  }

  private def encodeFrame(
      samples: Array[Int], start: Int, bs: Int, sampleRate: Int,
      channels: Int, bits: Int, codedNo: Long, strategy: String,
      stereo: String, variable: Boolean = false): Array[Byte] = {
    val chAsgn = stereo match {
      case "independent" => channels - 1
      case "leftside" => 8
      case "sideright" => 9
      case "midside" => 10
      case other => throw new IllegalArgumentException(s"stereo $other")
    }
    val w = new BitWriter
    w.writeU(0x3FFE, 14) // sync
    w.writeU(0, 1) // reserved
    w.writeU(if (variable) 1 else 0, 1) // blocking strategy
    w.writeU(7, 4) // block size: 16-bit at end
    w.writeU(0, 4) // sample rate: from STREAMINFO
    w.writeU(chAsgn, 4)
    val ssCode = bits match {
      case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
      case _ => 0 // from STREAMINFO
    }
    w.writeU(ssCode, 3)
    w.writeU(0, 1) // reserved
    writeCodedNumber(w, codedNo)
    w.writeU(bs - 1, 16)
    val headerBytes = w.toBytes // snapshot; the writer keeps accumulating
    w.writeU(crc8(headerBytes, 0, headerBytes.length), 8)
    // channel derivation: decorrelated modes carry the difference signal
    // in a side channel one bit deeper (it spans twice the range)
    def chan(c: Int): Array[Int] = {
      val s = new Array[Int](bs)
      var j = 0
      while (j < bs) { s(j) = samples((start + j) * channels + c); j += 1 }
      s
    }
    val (chans, bpss): (Array[Array[Int]], Array[Int]) = stereo match {
      case "independent" =>
        (Array.tabulate(channels)(chan), Array.fill(channels)(bits))
      case _ =>
        val l = chan(0); val r = chan(1)
        val side = Array.tabulate(bs)(j => l(j) - r(j))
        stereo match {
          case "leftside" => (Array(l, side), Array(bits, bits + 1))
          case "sideright" => (Array(side, r), Array(bits + 1, bits))
          case "midside" =>
            val mid = Array.tabulate(bs)(j => (l(j) + r(j)) >> 1)
            (Array(mid, side), Array(bits, bits + 1))
        }
    }
    var ch = 0
    while (ch < chans.length) {
      writeSubframe(w, chans(ch), bpss(ch), strategy)
      ch += 1
    }
    w.alignZero()
    val body = w.toBytes
    w.writeU(crc16(body, 0, body.length), 16)
    w.toBytes
  }
}
