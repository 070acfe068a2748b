package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The FLAC fixed-predictor subset codec: lossless-ness is the whole
  * contract — decode(encode(s)) must return s bit-for-bit for every
  * subframe strategy, CRCs must actually gate, and out-of-subset or
  * corrupt streams must land on None / decode_ok=false, never garbage.
  */
class FlacSpec extends SparkSpec {
  import spark.implicits._

  private def samples(n: Int, channels: Int): Array[Int] =
    Array.tabulate(n * channels)(k =>
      ((k / channels) * 37 + (k % channels) * 11) % 201 - 100)

  test("encode→decode round-trips bit-for-bit for every subframe strategy") {
    for (strategy <- Seq("verbatim", "fixed2");
         (n, ch) <- Seq((300, 1), (500, 2), (1000, 2))) {
      val s = samples(n, ch)
      val bytes = FlacCodec.encode(s, 8000, ch, bits = 16,
        blockSize = 256, strategy = strategy)
      val d = FlacCodec.decode(bytes)
      assert(d.isDefined, s"$strategy n=$n ch=$ch must decode")
      assert(d.get.sampleRate === 8000)
      assert(d.get.channels === ch)
      assert(d.get.bits === 16)
      assert(d.get.samples.toSeq === s.toSeq, s"$strategy n=$n ch=$ch")
    }
    // constant subframes need per-channel-constant input
    val const = Array.fill(400 * 2)(0).zipWithIndex.map {
      case (_, k) => if (k % 2 == 0) 17 else -9
    }
    val bytes = FlacCodec.encode(const, 16000, 2, bits = 16,
      blockSize = 128, strategy = "constant")
    assert(FlacCodec.decode(bytes).get.samples.toSeq === const.toSeq)
  }

  test("LPC subframes round-trip bit-for-bit (the encoder-default path)") {
    // a sine-ish signal LPC models well, plus the lattice fixture, plus
    // a noisy signal that stresses the Rice parameter fit
    val sine = Array.tabulate(2000)(i => (math.sin(i * 0.07) * 12000).toInt)
    val noisy = {
      val rnd = new scala.util.Random(41)
      Array.tabulate(1500)(_ => rnd.nextInt(60000) - 30000)
    }
    for ((s, name) <- Seq((sine, "sine"), (samples(1200, 1), "lattice"),
        (noisy, "noisy"))) {
      val bytes = FlacCodec.encode(s, 16000, 1, bits = 16,
        blockSize = 256, strategy = "lpc")
      val d = FlacCodec.decode(bytes)
      assert(d.isDefined, s"lpc $name must decode")
      assert(d.get.samples.toSeq === s.toSeq, s"lpc $name")
    }
    // and LPC actually predicts: smaller than verbatim on the sine
    val lpc = FlacCodec.encode(sine, 16000, 1, 16, strategy = "lpc")
    val verb = FlacCodec.encode(sine, 16000, 1, 16, strategy = "verbatim")
    assert(lpc.length < verb.length,
      s"lpc ${lpc.length} must beat verbatim ${verb.length} on a sine")
  }

  test("stereo decorrelation modes round-trip bit-for-bit, every subframe type") {
    // correlated stereo (side signal small — what decorrelation is FOR)
    val n = 900
    val stereoS = Array.tabulate(n * 2) { k =>
      val j = k / 2
      val base = (math.sin(j * 0.05) * 9000).toInt
      if (k % 2 == 0) base else base + (j % 7) - 3
    }
    for (mode <- Seq("leftside", "sideright", "midside");
         strategy <- Seq("verbatim", "fixed2", "lpc")) {
      val bytes = FlacCodec.encode(stereoS, 22050, 2, bits = 16,
        blockSize = 256, strategy = strategy, stereo = mode)
      val d = FlacCodec.decode(bytes)
      assert(d.isDefined, s"$mode/$strategy must decode")
      assert(d.get.channels === 2)
      assert(d.get.samples.toSeq === stereoS.toSeq, s"$mode/$strategy")
    }
    // odd mid/side parities: l+r odd exercises the side parity bit
    val odd = Array.tabulate(500 * 2)(k => if (k % 2 == 0) k / 2 else k / 2 + 1)
    val ob = FlacCodec.encode(odd, 8000, 2, 16, blockSize = 128,
      strategy = "fixed2", stereo = "midside")
    assert(FlacCodec.decode(ob).get.samples.toSeq === odd.toSeq)
    // and decorrelation pays: mid/side beats independent on correlated input
    val ms = FlacCodec.encode(stereoS, 22050, 2, 16, strategy = "fixed2",
      stereo = "midside")
    val ind = FlacCodec.encode(stereoS, 22050, 2, 16, strategy = "fixed2")
    assert(ms.length < ind.length,
      s"mid/side ${ms.length} must beat independent ${ind.length}")
  }

  test("fixed2 actually compresses the linear-ish ramp below verbatim size") {
    val s = samples(4000, 1)
    val fixed = FlacCodec.encode(s, 8000, 1, 16, strategy = "fixed2")
    val verb = FlacCodec.encode(s, 8000, 1, 16, strategy = "verbatim")
    assert(fixed.length < verb.length,
      s"fixed ${fixed.length} must beat verbatim ${verb.length}")
  }

  test("multi-frame streams (block size < total) decode across frame boundaries") {
    val s = samples(1000, 2)
    val bytes = FlacCodec.encode(s, 44100, 2, 16, blockSize = 192)
    val d = FlacCodec.decode(bytes).get
    assert(d.samples.toSeq === s.toSeq)
  }

  test("variable-blocksize streams round-trip bit-for-bit (uneven schedule)") {
    for ((strategy, ch, stereo) <- Seq(
        ("fixed2", 1, "independent"),
        ("lpc", 1, "independent"),
        ("lpc", 2, "midside"),
        ("verbatim", 2, "leftside"))) {
      val n = 720
      val s = samples(n, ch)
      val bytes = FlacCodec.encode(s, 8000, ch, bits = 16,
        strategy = strategy, stereo = stereo,
        blockSizes = Seq(192, 256, 64, 208))
      // container-level marker: STREAMINFO min != max blocksize
      val minB = ((bytes(8) & 0xff) << 8) | (bytes(9) & 0xff)
      val maxB = ((bytes(10) & 0xff) << 8) | (bytes(11) & 0xff)
      assert(minB === 64 && maxB === 256, s"min=$minB max=$maxB")
      val d = FlacCodec.decode(bytes)
      assert(d.isDefined, s"variable $strategy/$stereo must decode")
      assert(d.get.samples.toSeq === s.toSeq, s"variable $strategy/$stereo")
    }
    // single-frame schedule and a short tail frame both round-trip
    val s1 = samples(100, 1)
    assert(FlacCodec.decode(FlacCodec.encode(s1, 8000, 1, 16,
      blockSizes = Seq(100))).get.samples.toSeq === s1.toSeq)
    val s2 = samples(300, 1)
    assert(FlacCodec.decode(FlacCodec.encode(s2, 8000, 1, 16,
      blockSizes = Seq(256, 44))).get.samples.toSeq === s2.toSeq)
    // a schedule that does not cover the sample count fails loudly
    intercept[IllegalArgumentException] {
      FlacCodec.encode(s2, 8000, 1, 16, blockSizes = Seq(256))
    }
  }

  test("coded-number validation: a frame with the wrong sample number is rejected") {
    // encode a 2-frame variable stream, then corrupt the second frame's
    // coded sample number; CRC-8 is recomputed so only the VALIDATION
    // can catch the skip — guards against silent frame mis-ordering
    val s = samples(320, 1)
    val bytes = FlacCodec.encode(s, 8000, 1, 16, blockSizes = Seq(256, 64))
    assert(FlacCodec.decode(bytes).isDefined)
    // the second frame's header is fully deterministic: FF F9 (sync +
    // variable) 70 (bsCode 7, sr from STREAMINFO) 08 (mono, 16-bit)
    // C4 80 (sample number 256) 00 3F (block size 64 − 1)
    val want = Array(0xFF, 0xF9, 0x70, 0x08, 0xC4, 0x80, 0x00, 0x3F)
      .map(_.toByte)
    val second = bytes.indices.find(i =>
      i + want.length <= bytes.length &&
        want.indices.forall(j => bytes(i + j) == want(j))).get
    // rewrite the coded sample number 256 → 192 (0xC3 0x80) and FIX the
    // header CRC-8 (4 fixed + 2 coded + 2 blocksize bytes = 8) so only
    // the sample-number validation can catch the skip
    val bad = bytes.clone()
    bad(second + 4) = 0xC3.toByte
    bad(second + 8) = FlacCodec.crc8(bad, second, second + 8).toByte
    assert(FlacCodec.decode(bad).isEmpty,
      "a sample-number skip must be rejected, not silently re-seated")
  }

  test("a flipped bit fails a CRC and decodes to None, never to wrong samples") {
    val s = samples(600, 1)
    val bytes = FlacCodec.encode(s, 8000, 1, 16, blockSize = 256)
    // flip one bit in the frame payload region (past magic+streaminfo)
    var rejected = 0
    for (off <- Seq(60, bytes.length / 2, bytes.length - 5)) {
      val corrupt = bytes.clone()
      corrupt(off) = (corrupt(off) ^ 0x10).toByte
      val d = FlacCodec.decode(corrupt)
      // either the CRC rejects it (None) or — if the flip hit a CRC byte
      // itself — the stream still decodes to the ORIGINAL samples
      if (d.isEmpty) rejected += 1
      else assert(d.get.samples.toSeq === s.toSeq)
    }
    assert(rejected >= 2, s"CRCs must catch payload corruption ($rejected/3)")
  }

  test("not-FLAC and truncated streams return None") {
    assert(FlacCodec.decode(null).isEmpty)
    assert(FlacCodec.decode("not a flac file at all".getBytes).isEmpty)
    val ok = FlacCodec.encode(samples(300, 1), 8000, 1, 16)
    assert(FlacCodec.decode(ok.take(30)).isEmpty)
    assert(FlacCodec.decode(ok.dropRight(3)).isEmpty)
  }

  test("decodeAudio routes FLAC through the codec with WAV-identical stats") {
    val flacRows = (0L until 3L).map { i =>
      (i, Multimodal.syntheticFlac(240 + i.toInt * 60, 8000, (i % 2).toInt + 1))
    }
    // one LPC-free but out-of-subset impostor: stereo-decorrelated
    // channel assignment is rejected, not mis-decoded — emulate with a
    // corrupt channel-assignment nibble
    val media = (flacRows :+ (9L, "fLaC but not really".getBytes.toArray))
      .toDF("doc_id", "content")
    val got = Multimodal.decodeAudio(media).collect()
      .map(f => f.doc_id -> f).toMap
    for (i <- 0L until 3L) {
      val f = got(i)
      val n = (240 + i.toInt * 60) * ((i % 2).toInt + 1)
      val vals = (0 until n).map { k =>
        val ch = (i % 2).toInt + 1
        ((k / ch) * 37 + (k % ch) * 11) % 201 - 100
      }
      assert(f.decode_ok, s"doc $i")
      assert(f.sample_rate === 8000)
      assert(f.bits === 16)
      assert(f.n_frames === 240 + i * 60)
      assert(f.peak === vals.map(math.abs).max)
      assert(math.abs(f.mean_amp - vals.sum.toDouble / n) < 1e-9)
      assert(math.abs(f.rms - math.sqrt(
        vals.map(v => v.toLong * v).sum.toDouble / n)) < 1e-9)
    }
    assert(!got(9L).decode_ok, "non-FLAC payload with magic must fail loud")
  }
}
