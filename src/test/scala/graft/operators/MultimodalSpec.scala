package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "tiny"), (2L, "a" * 100), (3L, "b" * 1000)).toDF("doc_id", "text")

  test("media table shape: binary content + typed metadata") {
    val media = Multimodal.toMediaTable(docs, "doc_id", "text")
    assert(media.schema("content").dataType.typeName === "binary")
    val meta = media.select($"meta.byte_len").as[Long].collect().sorted
    assert(meta.toSeq === Seq(4L, 100L, 1000L))
  }

  test("stub decode runs partition-parallel and is deterministic") {
    val media = Multimodal.toMediaTable(docs.repartition(3), "doc_id", "text")
    val f1 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeStub(media).collect().sortBy(_.doc_id)
    assert(f1.toSeq === f2.toSeq)
    val tiny = f1.head
    assert(tiny.byte_len === 4L && tiny.width === (4 * 7 % 512 + 16) && tiny.n_frames === 5)
    assert(f1.map(_.content_hash).distinct.length === 3)
  }

  test("frame sampling explodes every k-th frame index") {
    val features = Multimodal.decodeStub(Multimodal.toMediaTable(docs, "doc_id", "text"))
    val frames = Multimodal.sampleFrames(features, everyK = 2)
    val tiny = frames.filter($"doc_id" === 1).select($"frame_idx").as[Long].collect().toSeq
    assert(tiny === Seq(0L, 2L, 4L)) // n_frames=5 → 0,2,4
  }

  test("real decode: PNG and BMP round-trip to exact pixel features") {
    val payloads = Seq(
      (1L, Multimodal.syntheticImage(32, 16, "png")),
      (2L, Multimodal.syntheticImage(32, 16, "bmp")),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    // both codecs decode to identical sRGB features (layout-independent)
    Seq(got(0), got(1)).foreach { f =>
      assert(f.decode_ok && f.width === 32 && f.height === 16 && f.channels === 3)
      assert(f.mean_r === 15.5 && f.mean_g === 7.5 && f.mean_b === 37.0, f)
    }
    // undecodable bytes are a data row, not an exception
    assert(!got(2).decode_ok && got(2).width === -1 && got(2).channels === 0)
  }

  test("real decode: baseline JPEG goes through the from-spec JpegCodec") {
    // uniform blocks at Q=1 are lossless, so the means are exact
    val jpeg = JpegCodec.uniformBlockFixture(4, 2, (i, j) => 10 + i + 8 * j)
    val payloads = Seq((1L, jpeg)).toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads, "doc_id", "payload")
    val f = Multimodal.decodeImages(media).collect().head
    assert(f.decode_ok && f.width === 32 && f.height === 16 && f.channels === 1)
    // mean over 8 blocks of (10 + i + 8j): 10 + mean(i) + 8*mean(j) = 15.5
    assert(f.mean_r === 15.5 && f.mean_g === 15.5 && f.mean_b === 15.5)
  }

  test("real audio decode: WAV round-trips to exact integer-domain stats") {
    val payloads = Seq(
      (1L, Multimodal.syntheticWav(480, 8000, 1, 16)),
      (2L, Multimodal.syntheticWav(600, 16000, 2, 16)),
      (3L, Multimodal.syntheticWav(256, 8000, 1, 8)),
      (4L, "not a wav".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeAudio(media).collect().sortBy(_.doc_id)

    // independent reference: same closed form, straight Scala loops
    def expect(n: Int, ch: Int): (Double, Double, Int) = {
      var sum = 0L; var ss = 0L; var peak = 0
      for (i <- 0 until n; c <- 0 until ch) {
        val v = (i * 37 + c * 11) % 201 - 100
        sum += v; ss += v.toLong * v; peak = math.max(peak, math.abs(v))
      }
      (math.sqrt(ss.toDouble / (n * ch)), sum.toDouble / (n * ch), peak)
    }
    for ((f, (nf, rate, ch, bits)) <- Seq(
        got(0) -> (480, 8000, 1, 16),
        got(1) -> (600, 16000, 2, 16),
        got(2) -> (256, 8000, 1, 8))) {
      val (rms, mean, peak) = expect(nf, ch)
      assert(f.decode_ok && f.sample_rate === rate && f.channels === ch &&
        f.bits === bits && f.n_frames === nf.toLong, f)
      assert(f.rms === rms && f.mean_amp === mean && f.peak === peak, f)
    }
    // undecodable bytes are a data row, not an exception
    assert(!got(3).decode_ok && got(3).bits === -1 && got(3).n_frames === -1L)
  }

  test("real audio decode: AIFF and AU round-trip through the JDK encoders") {
    val payloads = Seq(
      (1L, Multimodal.syntheticPcm16(480, 8000, 1, "aiff")),
      (2L, Multimodal.syntheticPcm16(600, 16000, 2, "aiff")),
      (3L, Multimodal.syntheticPcm16(256, 11025, 1, "au")),
      (4L, Multimodal.syntheticPcm16(300, 22050, 2, "au")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeAudio(media).collect().sortBy(_.doc_id)
    def expect(n: Int, ch: Int): (Double, Double, Int) = {
      var sum = 0L; var ss = 0L; var peak = 0
      for (i <- 0 until n; c <- 0 until ch) {
        val v = (i * 37 + c * 11) % 201 - 100
        sum += v; ss += v.toLong * v; peak = math.max(peak, math.abs(v))
      }
      (math.sqrt(ss.toDouble / (n * ch)), sum.toDouble / (n * ch), peak)
    }
    for ((f, (nf, rate, ch)) <- Seq(
        got(0) -> (480, 8000, 1), got(1) -> (600, 16000, 2),
        got(2) -> (256, 11025, 1), got(3) -> (300, 22050, 2))) {
      val (rms, mean, peak) = expect(nf, ch)
      assert(f.decode_ok && f.sample_rate === rate && f.channels === ch &&
        f.bits === 16 && f.n_frames === nf.toLong, f)
      assert(f.rms === rms && f.mean_amp === mean && f.peak === peak, f)
    }
  }

  test("real decode: TIFF round-trips to exact pixel features (JDK plugin)") {
    val payloads = Seq(
      (1L, Multimodal.syntheticImage(32, 16, "tiff")),
      (2L, Multimodal.syntheticImage(48, 24, "tiff")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeImages(media).collect().sortBy(_.doc_id)
    assert(got(0).decode_ok && got(0).width === 32 && got(0).height === 16 &&
      got(0).channels === 3 && got(0).mean_r === 15.5 &&
      got(0).mean_g === 7.5 && got(0).mean_b === 37.0, got(0))
    assert(got(1).decode_ok && got(1).width === 48 && got(1).height === 24 &&
      got(1).mean_r === 23.5 && got(1).mean_g === 11.5 && got(1).mean_b === 37.0,
      got(1))
  }

  test("real video decode: AVI raw-DIB frames sample by stride with exact means") {
    val payloads = Seq(
      (1L, Multimodal.syntheticAvi(32, 16, 7)),
      (2L, "not an avi".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeVideoFrames(media, everyK = 3).collect()
      .sortBy(f => (f.doc_id, f.frame_idx))
    // 7 frames, stride 3 → frames 0, 3, 6; never frames 1,2,4,5
    val vid = got.filter(_.doc_id == 1L)
    assert(vid.map(_.frame_idx).toSeq === Seq(0, 3, 6))
    vid.foreach { f =>
      assert(f.decode_ok && f.width === 32 && f.height === 16)
      assert(f.mean_r === 31.0 + f.frame_idx, f)     // w−1+f
      assert(f.mean_g === 30.0 + 2 * f.frame_idx, f) // 2(h−1)+2f
      assert(f.mean_b === 37.0, f)
    }
    // an unparseable container is one data row, not an exception
    val bad = got.filter(_.doc_id == 2L)
    assert(bad.length === 1 && !bad.head.decode_ok && bad.head.frame_idx === -1)
  }

  test("real video decode: MJPEG frames go through the JDK JPEG reader") {
    val payloads = Seq((1L, Multimodal.syntheticAvi(32, 16, 4, mjpeg = true)))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads, "doc_id", "payload")
    val got = Multimodal.decodeVideoFrames(media, everyK = 2).collect()
      .sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq === Seq(0, 2))
    got.foreach { f =>
      assert(f.decode_ok && f.width === 32 && f.height === 16)
      // lossy codec: means land near the pattern's, not exactly on it
      assert(math.abs(f.mean_r - (31.0 + f.frame_idx)) < 3.0, f)
      assert(math.abs(f.mean_b - 37.0) < 3.0, f)
    }
  }

  test("dhash64: fingerprint matches an independent formula-space computation") {
    // independent implementation: compute the dHash straight from the
    // synthetic pixel FORMULAS (no codec, no BufferedImage) — agreement
    // proves the decode→luma→grid→gradient pipeline is lossless and the
    // literal oracle constants are not self-referential
    def formulaDhash(w: Int, h: Int, seed: Int,
        perturb: Option[(Int, Int, Int, Int)]): Long = {
      def luma(x: Int, y: Int): Int = {
        val inBox = perturb.exists { case (x0, y0, pw, ph) =>
          x >= x0 && x < x0 + pw && y >= y0 && y < y0 + ph }
        val (r, g, b) =
          if (inBox) (255, 255, 255)
          else ((x * x * 7 + y * 13 + seed * 29) % 256,
            (y * y * 5 + x * 11 + seed * 41) % 256,
            (x * y + seed * 11) % 256)
        (77 * r + 150 * g + 29 * b) >> 8
      }
      var hash = 0L
      for (j <- 0 until 8; i <- 0 until 8) {
        def block(bi: Int): (Long, Long) = {
          val x0 = bi * w / 9; val x1 = (bi + 1) * w / 9
          val y0 = j * h / 8; val y1 = (j + 1) * h / 8
          var s = 0L
          for (y <- y0 until y1; x <- x0 until x1) s += luma(x, y)
          (s, (x1 - x0).toLong * (y1 - y0))
        }
        val (sl, cl) = block(i); val (sr, cr) = block(i + 1)
        if (sl * cr > sr * cl) hash |= 1L << (j * 8 + i)
      }
      hash
    }
    val cases = Seq(
      (1L, 64, 64, 1, None, "png"),
      (2L, 64, 64, 1, Some((12, 12, 10, 10)), "bmp"),
      (3L, 48, 40, 2, None, "png"),
      (4L, 40, 40, 6, Some((5, 5, 4, 4)), "bmp"))
    val payloads = cases.map { case (id, w, h, seed, p, fmt) =>
      (id, Multimodal.syntheticPatternImage(w, h, seed, p, fmt))
    }.toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.dhash64(media).collect().map(x => x.doc_id -> x).toMap
    cases.foreach { case (id, w, h, seed, p, _) =>
      assert(got(id).hash_ok)
      assert(got(id).dhash === formulaDhash(w, h, seed, p),
        s"doc $id: codec round-trip drifted from formula space")
    }
  }

  test("dhash64: perturbed images stay near, distinct seeds stay far") {
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val payloads = Seq(
      (0L, Multimodal.syntheticPatternImage(64, 64, 1, None, "png")),
      (1L, Multimodal.syntheticPatternImage(64, 64, 1, Some((12, 12, 10, 10)), "bmp")),
      (2L, Multimodal.syntheticPatternImage(64, 64, 3, None, "png")),
      (3L, "garbage".getBytes("UTF-8")),
      (4L, Multimodal.syntheticPatternImage(8, 6, 1, None, "png"))) // sub-grid
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads, "doc_id", "payload")
    val got = Multimodal.dhash64(media).collect().map(x => x.doc_id -> x).toMap
    assert(ham(got(0L).dhash, got(1L).dhash) <= 6, "planted near-dup drifted far")
    assert(ham(got(0L).dhash, got(2L).dhash) >= 15, "distinct seeds too close")
    // undecodable and sub-grid payloads are rows on the hash_ok=false
    // ladder, never exceptions
    assert(!got(3L).hash_ok && !got(4L).hash_ok)
  }

  test("dhash64 + hammingPairs64: banded join finds exactly the planted pairs") {
    val payloads = Seq(
      (0L, Multimodal.syntheticPatternImage(64, 64, 1, None, "png")),
      (1L, Multimodal.syntheticPatternImage(64, 64, 1, Some((12, 12, 10, 10)), "bmp")),
      (2L, Multimodal.syntheticPatternImage(48, 40, 2, None, "png")),
      (3L, Multimodal.syntheticPatternImage(48, 40, 2, Some((28, 18, 8, 8)), "bmp")),
      (4L, Multimodal.syntheticPatternImage(64, 64, 3, None, "png")))
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(3), "doc_id", "payload")
    val hashed = Multimodal.dhash64(media).toDF().filter($"hash_ok")
    val pairs = Dedup.hammingPairs64(hashed, "doc_id", "dhash", maxHamming = 6)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((0L, 1L), (2L, 3L)))
  }

  test("hammingPairs64 maxHamming=0: exact-hash pairs, bands stay discriminative") {
    // one 64-bit chunk — the mask must cover all 64 bits, not degenerate
    // to 0 (which would band every row to key 0: a full self cross join)
    val hashed = Seq(
      (1L, 0x1234567890abcdefL), (2L, 0x1234567890abcdefL),
      (3L, 0x1234567890abcdeeL), // hamming 1 from the pair — must NOT match
      (4L, -1L), (5L, -1L), (6L, 0L))
      .toDF("doc_id", "h")
    val pairs = Dedup.hammingPairs64(hashed, "doc_id", "h", maxHamming = 0)
    assert(pairs.select($"id_a", $"id_b").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L), (4L, 5L)))
    // and the banded join keys on the full hash: distinct hashes never meet
    val keys = hashed.select(
      call_function("shiftright", $"h", lit(0)).bitwiseAND(lit(-1L)).as("k"))
      .distinct().count()
    assert(keys === 4L)
  }

  test("animated GIF frame sampling: exact two-color means, stride, failure ladder") {
    val payloads = Seq(
      (0L, Multimodal.syntheticAnimatedGif(10, 6, 5, 3)),
      (1L, Multimodal.syntheticAnimatedGif(8, 4, 1, 7)),  // single frame
      (2L, "GIF89a-but-not-really".getBytes("UTF-8")),    // corrupt GIF header
      (3L, Array[Byte](1, 2, 3)))                         // not a container at all
      .toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(payloads.repartition(2), "doc_id", "payload")
    val got = Multimodal.decodeGifFrames(media, everyK = 2).collect()
      .map(f => (f.doc_id, f.frame_idx) -> f).toMap
    // doc 0: frames 0, 2, 4 sampled out of 5
    assert(got.keySet === Set((0L, 0), (0L, 2), (0L, 4), (1L, 0), (2L, -1), (3L, -1)))
    // exact means: left half (5 of 10 cols) color, right half black
    def c(seed: Int, f: Int) =
      ((seed * 29 + f * 11) % 256, (seed * 41 + f * 7) % 256, (seed * 11 + f * 3) % 256)
    for (f <- Seq(0, 2, 4)) {
      val (r, g, b) = c(3, f)
      val row = got((0L, f))
      assert(row.decode_ok && row.width === 10 && row.height === 6)
      assert(row.mean_r === r / 2.0 && row.mean_g === g / 2.0 && row.mean_b === b / 2.0,
        s"frame $f")
    }
    assert(got((1L, 0)).decode_ok && got((1L, 0)).width === 8)
    assert(!got((2L, -1)).decode_ok && !got((3L, -1)).decode_ok)
  }

  test("resize plan preserves aspect and caps the long side") {
    val features = Multimodal.decodeStub(Multimodal.toMediaTable(docs, "doc_id", "text")).toDF()
    val resized = Multimodal.resizePlan(features, maxSide = 64)
    val bad = resized.filter($"out_width" > 64 || $"out_height" > 64)
    assert(bad.count() === 0)
    val noUpscale = resized.filter($"out_width" > $"width" || $"out_height" > $"height")
    assert(noUpscale.count() === 0)
  }

  test("resizePixels: box averages match a hand computation; small images reject") {
    import spark.implicits._
    // 4x2 image with known pixels -> 2x1 resize: boxes are 2x2
    val img = new java.awt.image.BufferedImage(4, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = Array(
      Array(0x010203, 0x050607, 0x212223, 0x252627),
      Array(0x090A0B, 0x0D0E0F, 0x292A2B, 0x2D2E2F))
    for (y <- 0 until 2; x <- 0 until 4) img.setRGB(x, y, px(y)(x))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val media = Multimodal.toMediaTable(
      Seq((1L, bos.toByteArray), (2L, Array[Byte](1, 2, 3))).toDF("doc_id", "payload"),
      "doc_id", "payload")
    val out = Multimodal.resizePixels(media, 2, 1)(spark).collect().sortBy(_.doc_id)
    val a = out(0)
    assert(a.ok)
    // left box: r = (1+5+9+13)/4 = 7, g = 8, b = 9; right: r = 39, g = 40, b = 41
    assert((a.sum_r, a.sum_g, a.sum_b) === ((7L + 39L, 8L + 40L, 9L + 41L)))
    // weights: left 1, right 2
    assert((a.wsum_r, a.wsum_g, a.wsum_b) === ((7L + 2 * 39L, 8L + 2 * 40L, 9L + 2 * 41L)))
    assert(!out(1).ok)
    // a 1x1 source cannot fill a 2x1 grid
    val tiny = new java.awt.image.BufferedImage(1, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos2 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(tiny, "png", bos2)
    val m2 = Multimodal.toMediaTable(Seq((3L, bos2.toByteArray)).toDF("doc_id", "payload"),
      "doc_id", "payload")
    assert(!Multimodal.resizePixels(m2, 2, 1)(spark).collect().head.ok)
  }

  test("oversized header dims skip the ImageIO raster allocation") {
    // a valid PNG IHDR claiming 60000x60000 (3.6G px): ImageIO.read
    // allocates the raster from the header dims BEFORE any pixel data,
    // and the resulting OutOfMemoryError is an Error — it escapes a
    // `catch { case _: Exception }` quarantine and kills the executor.
    // The dims probe must turn it into a decode_ok=false DATA row.
    def be32(v: Int) = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt,
      0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes("US-ASCII"))
    ihdr.write(be32(60000)); ihdr.write(be32(60000))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // 8-bit RGB, no interlace
    val body = ihdr.toByteArray
    val crc = new java.util.zip.CRC32(); crc.update(body)
    bos.write(be32(13)); bos.write(body); bos.write(be32(crc.getValue.toInt))
    val huge = bos.toByteArray
    assert(Multimodal.safeImageRead(huge) === null)
    val media = Multimodal.toMediaTable(
      Seq((9L, huge)).toDF("doc_id", "payload"), "doc_id", "payload")
    val f = Multimodal.decodeImages(media).collect().head
    assert(!f.decode_ok && f.width === -1)
    assert(!Multimodal.dhash64(media).collect().head.hash_ok)
    assert(!Multimodal.resizePixels(media, 8, 8)(spark).collect().head.ok)
    // the guard must not break real decodes: a legit 16x8 PNG still reads
    val ok = Multimodal.safeImageRead(Multimodal.syntheticImage(16, 8, "png"))
    assert(ok != null && ok.getWidth === 16 && ok.getHeight === 8)
  }
}

class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("HLL approx_count_distinct within 5% of exact on events (A5)") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val exact = ev.select(countDistinct($"user_id")).as[Long].head().toDouble
    val approx = ev.select(approx_count_distinct($"user_id", 0.01)).as[Long].head().toDouble
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
