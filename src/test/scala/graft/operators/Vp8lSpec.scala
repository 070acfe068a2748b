package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8L (WebP lossless) codec: losslessness is the whole contract —
  * decode(encode(px)) must return px bit-for-bit — and the decoder must
  * handle the full bitstream surface the in-repo fixture encoder does
  * not emit: LZ77 backward references, the color cache, all transforms,
  * palette pixel bundling, and meta-prefix groups. Those paths are
  * exercised with hand-assembled spec-valid streams built from the
  * codec's own prefix-code writer.
  */
class Vp8lSpec extends AnyFunSuite {
  import Vp8lCodec._

  private def pattern(w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (0xFF << 24) | ((x % 256) << 16) | ((y % 256) << 8) | 37
    }

  test("encode→decode round-trips bit-for-bit (literal streams)") {
    for ((w, h) <- Seq((1, 1), (16, 16), (61, 23), (128, 64))) {
      val px = pattern(w, h)
      val d = Vp8lCodec.decode(Vp8lCodec.encode(w, h, px))
      assert(d.isDefined, s"${w}x$h must decode")
      assert(d.get.width === w && d.get.height === h)
      assert(d.get.argb.toSeq === px.toSeq, s"${w}x$h")
    }
  }

  test("subtract-green transform round-trips") {
    val px = pattern(37, 19)
    val d = Vp8lCodec.decode(Vp8lCodec.encode(37, 19, px, subtractGreen = true))
    assert(d.isDefined)
    assert(d.get.argb.toSeq === px.toSeq)
  }

  test("random ARGB (alpha varied) round-trips") {
    val rnd = new scala.util.Random(71)
    val px = Array.fill(48 * 31)(rnd.nextInt())
    val d = Vp8lCodec.decode(Vp8lCodec.encode(48, 31, px))
    assert(d.isDefined)
    assert(d.get.argb.toSeq === px.toSeq)
  }

  // ---- hand-assembled streams for the decoder-only surface ----

  private def header(w: BitWriter, wd: Int, ht: Int): Unit = {
    w.writeBits(wd - 1, 14); w.writeBits(ht - 1, 14)
    w.writeBits(0, 1); w.writeBits(0, 3)
  }

  /** Literal image stream body: [cache 0][meta 0 if level0][trees][pixels]. */
  private def literalBody(w: BitWriter, pxs: Seq[Int], level0: Boolean): Unit = {
    w.writeBits(0, 1) // no color cache
    if (level0) w.writeBits(0, 1) // no meta prefix
    val gL = new Array[Int](280); val rL = new Array[Int](256)
    val bL = new Array[Int](256); val aL = new Array[Int](256)
    pxs.foreach { p =>
      gL((p >> 8) & 0xFF) = 1; rL((p >> 16) & 0xFF) = 1
      bL(p & 0xFF) = 1; aL((p >>> 24) & 0xFF) = 1
    }
    // mark as used → lengths 1 (≤2 distinct per channel in these tests
    // keeps every tree simple/0-bit; more distinct values need real
    // lengths, so fall back to the encoder for those cases)
    def norm(l: Array[Int]): Array[Int] =
      if (l.count(_ > 0) <= 2) l
      else throw new IllegalArgumentException("use Vp8lCodec.encode for >2 symbols")
    Seq(norm(gL), norm(rL), norm(bL), norm(aL), new Array[Int](40))
      .foreach(l => writePrefixCode(w, l))
    val gC = pixelCodes(gL); val rC = pixelCodes(rL)
    val bC = pixelCodes(bL); val aC = pixelCodes(aL)
    pxs.foreach { p =>
      val (gc, gl) = gC((p >> 8) & 0xFF); writeCodeMsb(w, gc, gl)
      val (rc, rl) = rC((p >> 16) & 0xFF); writeCodeMsb(w, rc, rl)
      val (bc, bl) = bC(p & 0xFF); writeCodeMsb(w, bc, bl)
      val (ac, al) = aC((p >>> 24) & 0xFF); writeCodeMsb(w, ac, al)
    }
  }

  test("LZ77 backward reference: one literal + length-3 copy at distance 1") {
    val p0 = 0xFF0A141E // a=255 r=10 g=20 b=30
    val w = new BitWriter
    header(w, 4, 1)
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no cache
    w.writeBits(0, 1) // no meta
    // green tree: literal g=20 and length symbol 258 (code 2 → length 3)
    val gL = new Array[Int](280); gL(20) = 1; gL(258) = 1
    val rL = new Array[Int](256); rL(10) = 1
    val bL = new Array[Int](256); bL(30) = 1
    val aL = new Array[Int](256); aL(255) = 1
    val dL = new Array[Int](40); dL(1) = 1 // dist code 1 → value 2 → map (1,0) → 1
    Seq(gL, rL, bL, aL, dL).foreach(l => writePrefixCode(w, l))
    val gC = canonicalCodes(gL)
    // literal pixel (r/b/a trees are single-symbol → zero bits)
    writeCodeMsb(w, gC(20)._1, gC(20)._2)
    // copy: green symbol 258, then distance symbol (zero bits)
    writeCodeMsb(w, gC(258)._1, gC(258)._2)
    val d = Vp8lCodec.decode(wrapContainer(w.finish()))
    assert(d.isDefined, "LZ77 stream must decode")
    assert(d.get.argb.toSeq === Seq(p0, p0, p0, p0))
  }

  test("color cache: literal then two cache hits") {
    val p0 = 0xFF0A141E
    val cacheBits = 2
    val idx = ((0x1e35a7bd * p0) >>> (32 - cacheBits)) & 3
    val w = new BitWriter
    header(w, 3, 1)
    w.writeBits(0, 1) // no transforms
    w.writeBits(1, 1); w.writeBits(cacheBits, 4) // cache on
    w.writeBits(0, 1) // no meta
    val gL = new Array[Int](280 + 4); gL(20) = 1; gL(280 + idx) = 1
    val rL = new Array[Int](256); rL(10) = 1
    val bL = new Array[Int](256); bL(30) = 1
    val aL = new Array[Int](256); aL(255) = 1
    Seq(gL, rL, bL, aL, new Array[Int](40)).foreach(l => writePrefixCode(w, l))
    val gC = canonicalCodes(gL)
    writeCodeMsb(w, gC(20)._1, gC(20)._2) // literal
    writeCodeMsb(w, gC(280 + idx)._1, gC(280 + idx)._2) // cache hit
    writeCodeMsb(w, gC(280 + idx)._1, gC(280 + idx)._2) // cache hit
    val d = Vp8lCodec.decode(wrapContainer(w.finish()))
    assert(d.isDefined, "cache stream must decode")
    assert(d.get.argb.toSeq === Seq(p0, p0, p0))
  }

  test("color-indexing with 1-bit bundling: 8x2 two-color image") {
    val c0 = 0xFF102030; val c1 = 0xFFD0E0F7
    def sub(a: Int, b: Int): Int = {
      val ch = (((a >>> 24) - (b >>> 24)) & 0xFF) << 24
      val rr = ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
      val gg = ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
      val bb = ((a & 0xFF) - (b & 0xFF)) & 0xFF
      ch | rr | gg | bb
    }
    // indices per pixel: x < 4 → 0, else 1 (row-independent)
    val w = new BitWriter
    header(w, 8, 2)
    w.writeBits(1, 1); w.writeBits(3, 2) // COLOR_INDEXING
    w.writeBits(1, 8) // table size − 1
    literalBody(w, Seq(c0, sub(c1, c0)), level0 = false) // delta-coded palette
    w.writeBits(0, 1) // no more transforms
    // packed image is 1×2: green byte holds 8 one-bit indices
    val packed = (0xFF << 24) | (0xF0 << 8) // bits 0-3 = 0, 4-7 = 1
    literalBody(w, Seq(packed, packed), level0 = true)
    val d = Vp8lCodec.decode(wrapContainer(w.finish()))
    assert(d.isDefined, "palette stream must decode")
    val expect = Array.tabulate(16)(i => if (i % 8 < 4) c0 else c1)
    assert(d.get.argb.toSeq === expect.toSeq)
  }

  test("meta-prefix groups: left/right halves from two zero-bit groups") {
    val pa = 0xFF112233; val pb = 0xFF445566
    val w = new BitWriter
    header(w, 8, 2)
    w.writeBits(0, 1) // no transforms
    w.writeBits(0, 1) // no cache
    w.writeBits(1, 1); w.writeBits(0, 3) // meta, bits = 2 → 4×4 blocks
    // meta image 2×1: group indices 0, 1 packed as red*256+green
    literalBody(w, Seq(0xFF << 24, (0xFF << 24) | (1 << 8)), level0 = false)
    // two groups, every tree single-symbol (zero-bit pixel stream)
    def group(p: Int): Unit = {
      val gL = new Array[Int](280); gL((p >> 8) & 0xFF) = 1
      val rL = new Array[Int](256); rL((p >> 16) & 0xFF) = 1
      val bL = new Array[Int](256); bL(p & 0xFF) = 1
      val aL = new Array[Int](256); aL((p >>> 24) & 0xFF) = 1
      Seq(gL, rL, bL, aL, new Array[Int](40)).foreach(l => writePrefixCode(w, l))
    }
    group(pa); group(pb)
    val d = Vp8lCodec.decode(wrapContainer(w.finish()))
    assert(d.isDefined, "meta-prefix stream must decode")
    val expect = Array.tabulate(16)(i => if (i % 8 < 4) pa else pb)
    assert(d.get.argb.toSeq === expect.toSeq)
  }

  test("predictor transform round-trips every block mode") {
    val wd = 8; val ht = 4
    val px = pattern(wd, ht)
    def sub(a: Int, b: Int): Int = {
      val ch = (((a >>> 24) - (b >>> 24)) & 0xFF) << 24
      val rr = ((((a >> 16) & 0xFF) - ((b >> 16) & 0xFF)) & 0xFF) << 16
      val gg = ((((a >> 8) & 0xFF) - ((b >> 8) & 0xFF)) & 0xFF) << 8
      val bb = ((a & 0xFF) - (b & 0xFF)) & 0xFF
      ch | rr | gg | bb
    }
    for (mode <- 0 to 13) {
      // forward-residual with the decoder's own predictor (wiring test;
      // mode 12's arithmetic is hand-checked separately below)
      val res = new Array[Int](wd * ht)
      for (y <- 0 until ht; x <- 0 until wd) {
        val i = y * wd + x
        val m = if (x == 0 && y == 0) -1 else if (y == 0) -2
                else if (x == 0) -3 else mode
        res(i) = sub(px(i), Vp8lCodec.predictForTest(m, px, i, x, y, wd))
      }
      val w = new BitWriter
      header(w, wd, ht)
      w.writeBits(1, 1); w.writeBits(0, 2) // PREDICTOR
      w.writeBits(1, 3) // size_bits − 2 = 1 → 8×8 blocks → one block
      literalBody(w, Seq((0xFF << 24) | (mode << 8)), level0 = false)
      w.writeBits(0, 1) // no more transforms
      // residuals can hold many distinct values → use the encoder's
      // general tree writer by embedding them through encodeBody
      writeGeneralBody(w, res)
      val d = Vp8lCodec.decode(wrapContainer(w.finish()))
      assert(d.isDefined, s"predictor mode $mode must decode")
      assert(d.get.argb.toSeq === px.toSeq, s"predictor mode $mode")
    }
  }

  test("predictor mode 12 (ClampAddSubtractFull) arithmetic, hand-checked") {
    // L=(10,20,30) T=(100,200,50) TL=(200,100,40), channel-wise
    // clamp(L + T − TL): r = clamp(10+100−200) = 0; g = clamp(20+200−100)
    // = 120; b = clamp(30+50−40) = 40
    val px = Array(0xFFC86428, 0xFF64C832, 0xFF0A141E, 0)
    val pred = Vp8lCodec.predictForTest(12, px, 3, 1, 1, 2)
    assert(((pred >> 16) & 0xFF) === 0)
    assert(((pred >> 8) & 0xFF) === 120)
    assert((pred & 0xFF) === 40)
  }

  test("color transform round-trips") {
    val wd = 4; val ht = 4
    val px = pattern(wd, ht)
    val g2r = 3; val g2b = -2; val r2b = 1
    def delta(m: Int, c: Int): Int = (m * c.toByte.toInt) >> 5
    val res = px.map { p =>
      val g = (p >> 8) & 0xFF
      val r0 = (p >> 16) & 0xFF
      val b0 = p & 0xFF
      val rT = (r0 - delta(g2r, g)) & 0xFF
      val bT = (b0 - delta(g2b, g) - delta(r2b, r0)) & 0xFF
      (p & 0xFF00FF00) | (rT << 16) | bT
    }
    val cte = (0xFF << 24) | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
    val w = new BitWriter
    header(w, wd, ht)
    w.writeBits(1, 1); w.writeBits(1, 2) // COLOR
    w.writeBits(0, 3) // size_bits − 2 = 0 → 4×4 blocks → one block
    literalBody(w, Seq(cte), level0 = false)
    w.writeBits(0, 1) // no more transforms
    writeGeneralBody(w, px2 = res)
    val d = Vp8lCodec.decode(wrapContainer(w.finish()))
    assert(d.isDefined, "color transform must decode")
    assert(d.get.argb.toSeq === px.toSeq)
  }

  test("not-WebP, lossy VP8, truncated → None, never garbage") {
    assert(Vp8lCodec.decode("not webp at all........................".getBytes).isEmpty)
    val lossy = Vp8lCodec.encode(4, 4, pattern(4, 4))
    System.arraycopy("VP8 ".getBytes, 0, lossy, 12, 4)
    assert(Vp8lCodec.decode(lossy).isEmpty)
    val ok = Vp8lCodec.encode(8, 8, pattern(8, 8))
    assert(Vp8lCodec.decode(ok.take(25)).isEmpty)
  }

  /** Full-tree literal body for arbitrary pixels (the encoder's main
    * path, reused on an open BitWriter for transform tests).
    */
  private def writeGeneralBody(w: BitWriter, px2: Array[Int]): Unit =
    Vp8lCodec.writeLiteralBody(w, px2, level0 = true)
}
