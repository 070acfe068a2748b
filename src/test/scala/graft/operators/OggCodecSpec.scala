package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Ogg page-walk invariants: fixtures reproduce their parameters
  * exactly (granule→duration arithmetic per codec), structural
  * corruption and out-of-subset streams land on None.
  */
class OggCodecSpec extends SparkSpec {
  import spark.implicits._

  test("vorbis: granules are pcm samples; pages, rate, channels exact") {
    val m = OggCodec.parse(
      OggCodec.fixture("vorbis", 2, 44100, 0, 10, 441000L)).get
    assert(m.codec === "vorbis" && m.channels === 2 && m.sampleRate === 44100)
    assert(m.nPages === 11L) // BOS + 10 data pages
    assert(m.lastGranule === 441000L && m.totalSamples === 441000L)
    assert(m.durationMs === 10000L)
    assert(m.preSkip === 0)
  }

  test("opus: 48 kHz granule clock minus pre-skip, input rate is a hint") {
    val m = OggCodec.parse(
      OggCodec.fixture("opus", 2, 48000, 312, 6, 96312L)).get
    assert(m.codec === "opus" && m.preSkip === 312)
    assert(m.totalSamples === 96000L)
    assert(m.durationMs === 2000L) // always the 48 kHz clock
    val hint = OggCodec.parse(
      OggCodec.fixture("opus", 1, 24000, 0, 3, 1440L)).get
    assert(hint.sampleRate === 24000 && hint.durationMs === 1440L * 1000 / 48000)
  }

  test("a -1 no-packet-ends granule page is skipped, not treated as position") {
    val m = OggCodec.parse(OggCodec.fixture("vorbis", 2, 32000, 0, 5,
      100000L, plantNoGranule = true)).get
    assert(m.lastGranule === 100000L)
    assert(m.nPages === 6L)
  }

  test("structural corruption → None: seq gap, missing EOS, data after EOS, bad magic") {
    val good = OggCodec.fixture("vorbis", 2, 44100, 0, 4, 1000L)
    assert(OggCodec.parse(good).isDefined)
    // corrupt the page-sequence of the 2nd page (first data page):
    // find its header (second "OggS") and bump the seq field
    def nthOggS(b: Array[Byte], n: Int): Int = {
      var found = 0; var i = 0
      while (i < b.length - 4) {
        if (b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' && b(i + 3) == 'S') {
          found += 1
          if (found == n) return i
        }
        i += 1
      }
      -1
    }
    val p2 = nthOggS(good, 2)
    val skip = good.clone(); skip(p2 + 18) = 9
    assert(OggCodec.parse(skip).isEmpty, "a page-sequence gap must reject")
    // truncate before the EOS page
    val last = nthOggS(good, 5)
    assert(OggCodec.parse(good.take(last)).isEmpty, "missing EOS must reject")
    // bytes after the EOS page
    assert(OggCodec.parse(good ++ Array[Byte](1, 2, 3)).isEmpty)
    val magic = good.clone(); magic(0) = 'X'
    assert(OggCodec.parse(magic).isEmpty)
    assert(OggCodec.parse("not an ogg".getBytes("UTF-8")).isEmpty)
    // a chained second stream (new BOS, new serial) is out of subset
    val chained = good ++ OggCodec.fixture("opus", 1, 48000, 0, 2, 960L)
    assert(OggCodec.parse(chained).isEmpty)
  }

  test("parseMeta: partition-parallel walk with the decode_ok ladder") {
    val payloads = Seq(
      (0L, OggCodec.fixture("opus", 2, 48000, 312, 3, 48312L)),
      (1L, "junk".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val rows = OggCodec.parseMeta(payloads)(spark).collect().sortBy(_.doc_id)
    assert(rows(0).decode_ok && rows(0).total_samples === 48000L)
    assert(!rows(1).decode_ok && rows(1).n_pages === -1L)
  }
}
