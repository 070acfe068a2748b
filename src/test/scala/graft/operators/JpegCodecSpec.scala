package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Baseline JPEG decode: lossless-by-construction uniform blocks,
  * foreign-decoder agreement (the JDK ImageIO decoder — an independent
  * implementation) within the spec's IDCT tolerance, partial-MCU
  * clipping, subsampling, restart markers, quarantine.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def imageioDecode(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not decode the fixture")
    img
  }

  test("uniform 8x8 blocks at quality 1.0 decode EXACTLY (DC-only, Q=1)") {
    val cell = (i: Int, j: Int) => (i * 37 + j * 101 + 13) % 256
    val bytes = JpegCodec.uniformBlockFixture(5, 3, cell)
    val d = JpegCodec.decode(bytes).get
    assert(d.width === 40 && d.height === 24 && d.nComp === 1)
    for (j <- 0 until 3; i <- 0 until 5; y <- 0 until 8; x <- 0 until 8) {
      val p = d.argb((j * 8 + y) * 40 + (i * 8 + x))
      assert((p & 0xff) === cell(i, j), s"block ($i,$j) px ($x,$y)")
      assert(((p >> 8) & 0xff) === cell(i, j)) // gray replicates
    }
  }

  test("foreign-decoder agreement: random grayscale, non-multiple-of-8 dims") {
    val rnd = new scala.util.Random(11)
    for ((w, h, q) <- Seq((37, 23, 0.9f), (64, 64, 0.5f), (9, 50, 0.75f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, rnd.nextInt(256))
      val bytes = JpegCodec.encodeImageIO(img, q)
      val mine = JpegCodec.decode(bytes).get
      assert(mine.width === w && mine.height === h)
      val ref = imageioDecode(bytes).getRaster
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = mine.argb(y * w + x) & 0xff
        val b = ref.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(a - b))
      }
      assert(maxDiff <= 2, s"$w x $h q=$q: max pixel diff $maxDiff")
    }
  }

  test("color: uniform RGB image round-trips within rounding (4:2:0 safe)") {
    for (rgb <- Seq(0x3366cc, 0xdd8822, 0x112211)) {
      val img = new java.awt.image.BufferedImage(32, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 32) img.setRGB(x, y, rgb)
      val bytes = JpegCodec.encodeImageIO(img, 1.0f)
      val mine = JpegCodec.decode(bytes).get
      assert(mine.nComp === 3)
      val ref = imageioDecode(bytes)
      for (y <- 0 until 16; x <- 0 until 32) {
        val a = mine.argb(y * 32 + x)
        val b = ref.getRGB(x, y)
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((b >> sh) & 0xff))
          assert(d <= 2, f"color $rgb%06x px($x,$y) shift $sh diff $d")
        }
      }
    }
  }

  test("color: random RGB agrees with ImageIO within tolerance at 4:4:4-ish smoothness") {
    // piecewise-constant 8x8 color tiles: chroma is uniform inside each
    // subsampling window, so upsampling-filter differences cannot bite
    val rnd = new scala.util.Random(5)
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (j <- 0 until 4; i <- 0 until 6) {
      val c = rnd.nextInt(0xffffff)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(i * 8 + x, j * 8 + y, c)
    }
    val bytes = JpegCodec.encodeImageIO(img, 0.95f)
    val mine = JpegCodec.decode(bytes).get
    val ref = imageioDecode(bytes)
    // compare tile INTERIORS only: at tile edges the 4:2:0 chroma
    // neighborhood is non-uniform, where T.81 leaves the upsampling
    // filter to the decoder (ImageIO interpolates, this codec
    // replicates) — interior pixels see a uniform neighborhood, so
    // every conforming filter agrees there
    var maxDiff = 0
    for (y <- 0 until 32; x <- 0 until 48
         if x % 8 >= 2 && x % 8 <= 5 && y % 8 >= 2 && y % 8 <= 5;
         sh <- Seq(16, 8, 0)) {
      val d = math.abs(((mine.argb(y * 48 + x) >> sh) & 0xff) -
        ((ref.getRGB(x, y) >> sh) & 0xff))
      maxDiff = math.max(maxDiff, d)
    }
    // quantization noise perturbs even within-tile chroma samples, so
    // interpolation-vs-replication still differs by a few LSBs here;
    // the EXACT agreements live in the uniform-color and grayscale tests
    assert(maxDiff <= 8, s"max interior channel diff $maxDiff")
  }

  test("restart markers: DRI interval decodes (metadata-driven fixture)") {
    // ask the ImageIO writer for a restart interval via its native
    // metadata tree; if this JDK ignores it, the fixture has no RSTn
    // and the assertion below keeps the test honest
    val img = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(3)
    for (y <- 0 until 64; x <- 0 until 64)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    javax.imageio.ImageIO.setUseCache(false)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = w.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.8f)
    val spec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
    val meta = w.getDefaultImageMetadata(spec, param)
    val fmt = "javax_imageio_jpeg_image_1.0"
    val tree = meta.getAsTree(fmt).asInstanceOf[org.w3c.dom.Element]
    val seq = tree.getElementsByTagName("markerSequence").item(0)
      .asInstanceOf[org.w3c.dom.Element]
    val dri = new javax.imageio.metadata.IIOMetadataNode("dri")
    dri.setAttribute("interval", "2")
    seq.insertBefore(dri, seq.getFirstChild)
    meta.setFromTree(fmt, tree)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, meta), param)
    ios.close(); w.dispose()
    val bytes = bos.toByteArray
    // witness the fixture really contains RST markers (FF D0-D7)
    val hasRst = bytes.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "writer did not honor the dri metadata node")
    val mine = JpegCodec.decode(bytes).get
    val ref = imageioDecode(bytes).getRaster
    var maxDiff = 0
    for (y <- 0 until 64; x <- 0 until 64)
      maxDiff = math.max(maxDiff,
        math.abs((mine.argb(y * 64 + x) & 0xff) - ref.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"max diff with restarts $maxDiff")
  }

  private def encodeProgressive(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = w.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(quality)
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    w.setOutput(ios)
    w.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); w.dispose()
    bos.toByteArray
  }

  test("progressive: ImageIO's multi-scan grayscale decodes and agrees") {
    // the JDK writer's default progressive script uses spectral
    // selection AND successive approximation (DC refine, AC refine) —
    // an independent encoder exercising every Annex G scan kind
    val rnd = new scala.util.Random(31)
    for ((w, h, q) <- Seq((37, 23, 0.9f), (64, 64, 0.5f), (16, 16, 1.0f))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, rnd.nextInt(256))
      val bytes = encodeProgressive(img, q)
      assert(bytes.containsSlice(Array[Byte](0xff.toByte, 0xc2.toByte)),
        "fixture is not SOF2")
      val mine = JpegCodec.decode(bytes).get
      assert(mine.width === w && mine.height === h && mine.nComp === 1)
      val ref = imageioDecode(bytes).getRaster
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val a = mine.argb(y * w + x) & 0xff
        val b = ref.getSample(x, y, 0)
        maxDiff = math.max(maxDiff, math.abs(a - b))
      }
      assert(maxDiff <= 2, s"progressive $w x $h q=$q: max diff $maxDiff")
    }
  }

  test("progressive: color tiles agree with ImageIO on tile interiors") {
    val rnd = new scala.util.Random(17)
    val img = new java.awt.image.BufferedImage(48, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (j <- 0 until 4; i <- 0 until 6) {
      val c = rnd.nextInt(0xffffff)
      for (y <- 0 until 8; x <- 0 until 8)
        img.setRGB(i * 8 + x, j * 8 + y, c)
    }
    val bytes = encodeProgressive(img, 0.95f)
    val mine = JpegCodec.decode(bytes).get
    assert(mine.nComp === 3)
    val ref = imageioDecode(bytes)
    var maxDiff = 0
    for (y <- 0 until 32; x <- 0 until 48
         if x % 8 >= 2 && x % 8 <= 5 && y % 8 >= 2 && y % 8 <= 5;
         sh <- Seq(16, 8, 0)) {
      val d = math.abs(((mine.argb(y * 48 + x) >> sh) & 0xff) -
        ((ref.getRGB(x, y) >> sh) & 0xff))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 8, s"progressive max interior channel diff $maxDiff")
  }

  test("progressive: truncated scan data quarantines") {
    val img = new java.awt.image.BufferedImage(24, 24,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val rnd = new scala.util.Random(7)
    for (y <- 0 until 24; x <- 0 until 24)
      img.getRaster.setSample(x, y, 0, rnd.nextInt(256))
    val bytes = encodeProgressive(img, 0.9f)
    assert(JpegCodec.decode(java.util.Arrays.copyOf(bytes, bytes.length / 3)) === None)
    assert(JpegCodec.decode(java.util.Arrays.copyOf(bytes, bytes.length - 3)) === None)
  }

  test("quarantine: truncation, bad magic, garbage") {
    val ok = JpegCodec.uniformBlockFixture(2, 2, (_, _) => 99)
    assert(JpegCodec.decode(java.util.Arrays.copyOf(ok, ok.length / 2)) === None)
    val bad = ok.clone(); bad(1) = 0x00
    assert(JpegCodec.decode(bad) === None)
    assert(JpegCodec.decode(Array[Byte](1, 2, 3)) === None)
    assert(JpegCodec.decode(null) === None)
  }

  test("allocation guard: crafted huge SOF dims quarantine, not OOM") {
    // a TINY file whose SOF declares 20000x20000 would allocate ~1.6 GB
    // (ARGB) before reading any entropy data; the 64M-pixel cap must
    // reject it as a quarantine (None), not an executor-killing Error
    val bytes = JpegCodec.uniformBlockFixture(2, 2, (_, _) => 42)
    var sof = -1
    var i = 2
    while (sof < 0 && i < bytes.length - 1) {
      if ((bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc0) sof = i
      i += 1
    }
    assert(sof > 0, "fixture has no SOF0")
    val huge = bytes.clone()
    // FF C0 len2 prec h2 w2: height at sof+5, width at sof+7 (big-endian)
    huge(sof + 5) = 0x4e.toByte; huge(sof + 6) = 0x20.toByte // 20000
    huge(sof + 7) = 0x4e.toByte; huge(sof + 8) = 0x20.toByte
    assert(JpegCodec.decode(huge) === None)
    assert(JpegCodec.decode(bytes).isDefined) // the unpatched twin still decodes
  }

  // 4-band JPEG through the JDK writer's RASTER path: samples stored
  // RAW (no color transform, no APP14 — verified by readRaster), so the
  // foreign encoder pins the entropy/Huffman/IDCT layer and the color
  // step checks against the documented closed form.
  private def write4(f: (Int, Int) => (Int, Int, Int, Int), w: Int, h: Int,
      q: Float): Array[Byte] = {
    val raster = java.awt.image.Raster.createInterleavedRaster(
      java.awt.image.DataBuffer.TYPE_BYTE, w, h, 4, null)
    for (y <- 0 until h; x <- 0 until w) {
      val (a, b, c, d) = f(x, y)
      raster.setSample(x, y, 0, a); raster.setSample(x, y, 1, b)
      raster.setSample(x, y, 2, c); raster.setSample(x, y, 3, d)
    }
    javax.imageio.ImageIO.setUseCache(false)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = wr.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(q)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(raster, null, null), param)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  /** Splice an Adobe APP14 with the given transform right after SOI. */
  private def withApp14(b: Array[Byte], transform: Int): Array[Byte] = {
    val seg = Array[Byte](0xFF.toByte, 0xEE.toByte, 0, 14,
      'A', 'd', 'o', 'b', 'e', 0, 100, 0, 0, 0, 0, transform.toByte)
    val out = new Array[Byte](b.length + seg.length)
    System.arraycopy(b, 0, out, 0, 2)
    System.arraycopy(seg, 0, out, 2, seg.length)
    System.arraycopy(b, 2, out, 2 + seg.length, b.length - 2)
    out
  }

  test("12-bit extended sequential (SOF1) decodes; sample renders its top byte") {
    // multiples of 16 in [1728, 2368] → the >> 4 downscale is exact
    val cell = (i: Int, j: Int) => 2048 + i * 160 - j * 320
    val bytes = JpegCodec.uniformBlock12Fixture(3, 2, cell)
    val d = JpegCodec.decode(bytes).get
    assert(d.width === 24 && d.height === 16 && d.nComp === 1)
    for (j <- 0 until 2; i <- 0 until 3; y <- 0 until 8; x <- 0 until 8) {
      val p = d.argb((j * 8 + y) * 24 + (i * 8 + x)) & 0xff
      assert(p === (cell(i, j) >> 4), s"block ($i,$j) px ($x,$y)")
    }
    // 12-bit under SOF0 must quarantine: baseline is 8-bit by spec
    val bad = bytes.clone()
    var k = 2
    while (!((bad(k) & 0xff) == 0xff && (bad(k + 1) & 0xff) == 0xc1)) k += 1
    bad(k + 1) = 0xc0.toByte
    assert(JpegCodec.decode(bad) === None)
  }

  test("CMYK: uniform 4-component decodes exactly (inverted multiply)") {
    // uniform blocks at q=1.0 are lossless → stored samples recover
    // exactly (readRaster witness), and the inverted-CMYK multiply has
    // a closed form: ch = s_ch · s_k / 255, rounded
    val plain = write4((_, _) => (200, 150, 100, 250), 16, 16, 1.0f)
    val d = JpegCodec.decode(plain).get
    assert(d.width === 16 && d.height === 16 && d.nComp === 4)
    val p = d.argb(3 * 16 + 3)
    assert(((p >> 16) & 0xff) === math.round(200.0 * 250 / 255).toInt)
    assert(((p >> 8) & 0xff) === math.round(150.0 * 250 / 255).toInt)
    assert((p & 0xff) === math.round(100.0 * 250 / 255).toInt)
    // APP14 transform 0 = same plain-CMYK interpretation
    val d0 = JpegCodec.decode(withApp14(plain, 0)).get
    assert(d0.argb.toSeq === d.argb.toSeq)
    // APP14 transform 2 = YCCK: BT.601 inverse on the first three
    // planes, then the same multiply — closed form on uniform data
    val d2 = JpegCodec.decode(withApp14(plain, 2)).get
    val c0 = math.round(200 + 1.402 * (100 - 128)).toInt
    val m0 = math.round(200 - 0.344136 * (150 - 128) - 0.714136 * (100 - 128)).toInt
    val y0 = 255.min(math.round(200 + 1.772 * (150 - 128)).toInt)
    val p2 = d2.argb(5 * 16 + 7)
    assert(((p2 >> 16) & 0xff) === math.round(c0 * 250.0 / 255).toInt)
    assert(((p2 >> 8) & 0xff) === math.round(m0 * 250.0 / 255).toInt)
    assert((p2 & 0xff) === math.round(y0 * 250.0 / 255).toInt)
  }

  test("Adobe RGB: 3-component transform=0 copies planes, no YCbCr inverse") {
    // the JDK writer's RASTER path stores 3-band samples RAW; splicing
    // APP14 transform=0 declares them RGB (the Photoshop export shape).
    // A decoder that still ran the YCbCr inverse would turn this uniform
    // (200,150,100) into a very different color — the ADVICE'd silent
    // misread.
    val raster = java.awt.image.Raster.createInterleavedRaster(
      java.awt.image.DataBuffer.TYPE_BYTE, 16, 16, 3, null)
    for (y <- 0 until 16; x <- 0 until 16) {
      raster.setSample(x, y, 0, 200)
      raster.setSample(x, y, 1, 150)
      raster.setSample(x, y, 2, 100)
    }
    javax.imageio.ImageIO.setUseCache(false)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = wr.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(raster, null, null), param)
    ios.close(); wr.dispose()
    val d = JpegCodec.decode(withApp14(bos.toByteArray, 0)).get
    assert(d.width === 16 && d.height === 16)
    val p = d.argb(5 * 16 + 7)
    assert(((p >> 16) & 0xff) === 200)
    assert(((p >> 8) & 0xff) === 150)
    assert((p & 0xff) === 100)
  }

  test("CMYK: random 4-component agrees with the JDK raster decode") {
    // the foreign witness for the non-uniform path: decode the SAME
    // file with the JDK reader's raster API (its own Huffman + IDCT),
    // push those samples through the documented color form, and demand
    // per-channel agreement within the IDCT tolerance
    val rnd = new scala.util.Random(23)
    val w = 37; val h = 21
    val bytes = write4((_, _) =>
      (rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)),
      w, h, 0.95f)
    for (transform <- Seq(-1, 2)) {
      val file = if (transform < 0) bytes else withApp14(bytes, transform)
      val mine = JpegCodec.decode(file).get
      assert(mine.nComp === 4 && mine.width === w && mine.height === h)
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(file))
      val rd = javax.imageio.ImageIO.getImageReaders(iis).next()
      rd.setInput(iis)
      val ref = rd.readRaster(0, null)
      rd.dispose(); iis.close()
      def cl(v: Double): Int =
        math.round(v).toInt.max(0).min(255)
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val s0 = ref.getSample(x, y, 0); val s1 = ref.getSample(x, y, 1)
        val s2 = ref.getSample(x, y, 2); val k = ref.getSample(x, y, 3)
        val (c0, m0, y0) =
          if (transform == 2)
            (cl(s0 + 1.402 * (s2 - 128)),
             cl(s0 - 0.344136 * (s1 - 128) - 0.714136 * (s2 - 128)),
             cl(s0 + 1.772 * (s1 - 128)))
          else (s0, s1, s2)
        val p = mine.argb(y * w + x)
        maxDiff = maxDiff.max(math.abs(((p >> 16) & 0xff) - cl(c0 * k / 255.0)))
          .max(math.abs(((p >> 8) & 0xff) - cl(m0 * k / 255.0)))
          .max(math.abs((p & 0xff) - cl(y0 * k / 255.0)))
      }
      assert(maxDiff <= 3, s"transform=$transform maxDiff=$maxDiff")
    }
  }
}
