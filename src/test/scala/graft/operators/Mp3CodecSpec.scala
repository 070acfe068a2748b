package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** MP3 container/frame-walk invariants: fixture walks reproduce their
  * parameters exactly, tags and padding are honored, corruption and
  * out-of-subset streams land on None — never a wrong count.
  */
class Mp3CodecSpec extends SparkSpec {
  import spark.implicits._

  test("CBR walk reproduces frame count, rate, channels, duration exactly") {
    val m = Mp3Codec.parse(
      Mp3Codec.fixture("1", 3, 44100, 2, Seq.fill(30)(128))).get
    assert(m.version === "1" && m.layer === 3)
    assert(m.sampleRate === 44100 && m.channels === 2)
    assert(m.nFrames === 30L && m.totalSamples === 30L * 1152)
    assert(m.durationMs === 30L * 1152 * 1000 / 44100)
    assert(m.bitrateMinKbps === 128 && m.bitrateMaxKbps === 128)
    assert(m.xingFrames === -1L && m.id3v2Bytes === 0L && !m.hasId3v1)
  }

  test("every subset family walks: L1/L2/L3 × MPEG-1/2/2.5, mono and stereo") {
    val cases = Seq(
      ("1", 1, 32000, 2, 384L), ("1", 2, 48000, 2, 1152L),
      ("1", 3, 48000, 1, 1152L), ("2", 3, 16000, 2, 576L),
      ("2.5", 3, 11025, 1, 576L))
    for ((v, l, r, ch, spf) <- cases) {
      val kbps = if (v == "1") 128 else 64
      val m = Mp3Codec.parse(Mp3Codec.fixture(v, l, r, ch, Seq.fill(7)(kbps)))
        .getOrElse(fail(s"$v L$l $r must parse"))
      assert(m.totalSamples === 7L * spf, s"$v L$l")
      assert(m.sampleRate === r && m.channels === ch)
    }
  }

  test("VBR stream: per-frame bitrates, is-vbr span, Xing frame count") {
    val m = Mp3Codec.parse(Mp3Codec.fixture("1", 3, 44100, 2,
      (0 until 40).map(j => Seq(96, 128, 160, 192)(j % 4)),
      xingFrames = 40L)).get
    assert(m.nFrames === 40L)
    assert(m.bitrateMinKbps === 96 && m.bitrateMaxKbps === 192)
    assert(m.xingFrames === 40L)
  }

  test("ID3v2 prefix and ID3v1 tail are skipped, sized, and flagged") {
    val m = Mp3Codec.parse(Mp3Codec.fixture("1", 3, 44100, 1,
      Seq.fill(10)(112), id3v2Size = 500, id3v1 = true)).get
    assert(m.id3v2Bytes === 510L) // 10-byte header + syncsafe size
    assert(m.hasId3v1)
    assert(m.nFrames === 10L)
  }

  test("corruption never mis-counts: flipped sync, truncation, garbage → None") {
    val good = Mp3Codec.fixture("1", 3, 44100, 2, Seq.fill(12)(128))
    assert(Mp3Codec.parse(good).isDefined)
    // zero the 5th frame's sync byte (frame lengths: 417, +1 when the
    // fixture's every-third padding bit is set)
    val off4 = (0 until 4).map(i => 417 + (if (i % 3 == 2) 1 else 0)).sum
    val bad = good.clone()
    bad(off4) = 0x00.toByte
    assert(Mp3Codec.parse(bad).isEmpty)
    assert(Mp3Codec.parse(good.take(good.length - 10)).isEmpty,
      "a truncated trailing frame must reject, not under-count")
    assert(Mp3Codec.parse("garbage".getBytes("UTF-8")).isEmpty)
    assert(Mp3Codec.parse(Array.emptyByteArray).isEmpty)
    // two VALID streams with different constants concatenated: the
    // stream-constant consistency check rejects at the boundary
    val mixed = good ++ Mp3Codec.fixture("2", 3, 22050, 1, Seq.fill(3)(64))
    assert(Mp3Codec.parse(mixed).isEmpty, "mixed version/rate rejected")
    // free-format (bitrate index 0) is out of subset by documentation:
    // a header with brIdx=0 rejects rather than guessing a frame length
    val free = good.clone()
    free(2) = (free(2) & 0x0F).toByte
    assert(Mp3Codec.parse(free).isEmpty)
  }

  test("parseMeta: partition-parallel walk with the decode_ok ladder") {
    val payloads = Seq(
      (0L, Mp3Codec.fixture("1", 3, 44100, 2, Seq.fill(5)(128))),
      (1L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = Mp3Codec.parseMeta(payloads)(spark).collect().sortBy(_.doc_id)
    assert(rows(0).decode_ok && rows(0).n_frames === 5L)
    assert(!rows(1).decode_ok && rows(1).n_frames === -1L)
  }
}
