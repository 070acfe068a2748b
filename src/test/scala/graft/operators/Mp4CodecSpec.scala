package graft.operators

import graft.SparkSpec
import graft.operators.Mp4Codec.{Track, TrackSpec}

/** ISO-BMFF writer/parser round-trips plus table semantics: stss-absent
  * sync rule, keyframe byte-range plans resolving into mdat, corrupt
  * payloads as data.
  */
class Mp4CodecSpec extends SparkSpec {

  private val video = TrackSpec(1L, video = true, 600L, 100L,
    (0 until 30).map(j => 100 + (j * 17) % 50), 6, 64, 36)
  private val audio = TrackSpec(2L, video = false, 48000L, 1024L,
    Seq.fill(50)(64), 0, 0, 0)

  test("round-trip: every table field survives encode → parse") {
    val bytes = Mp4Codec.encode(Seq(video, audio))
    val tracks = Mp4Codec.parse(bytes).get
    assert(tracks.length === 2)
    val v = tracks.find(_.trackId == 1L).get
    assert(v === Track(1L, "vide", "avc1", 600L, 3000L, 30L, 5L, 64L, 36L,
      (0 until 30).map(j => 100L + (j * 17) % 50).sum, v.firstChunkOffset))
    assert(v.firstChunkOffset > 0)
    val a = tracks.find(_.trackId == 2L).get
    assert(a.handler === "soun" && a.codec === "mp4a")
    assert(a.timescale === 48000L && a.durationTicks === 50L * 1024L)
    assert(a.nSamples === 50L && a.totalBytes === 50L * 64L)
  }

  test("stss absent → every sample is a sync sample (spec rule)") {
    val a = Mp4Codec.parse(Mp4Codec.encode(Seq(audio))).get.head
    assert(a.nKeyframes === a.nSamples)
  }

  test("keyframe plan: offsets resolve to the written sample bytes in mdat") {
    val bytes = Mp4Codec.encode(Seq(video, audio))
    val plan = Mp4Codec.keyframePlan(bytes, 1L, 1)
    // keyframes every 6th sample of 30 → samples 0,6,12,18,24
    assert(plan.map(_._1) === Seq(0L, 6L, 12L, 18L, 24L))
    for ((sampleIdx, off, size) <- plan) {
      assert(size === 100L + (sampleIdx * 17) % 50)
      // writer fills byte k of sample j with (trackId*31 + j*7 + k) & 0xff
      assert((bytes(off.toInt) & 0xff) === ((1 * 31 + sampleIdx * 7) & 0xff))
      val last = (off + size - 1).toInt
      assert((bytes(last) & 0xff) === ((1 * 31 + sampleIdx * 7 + (size - 1)) & 0xff))
    }
    // every-2nd thinning keeps ordinals 0, 2, 4
    assert(Mp4Codec.keyframePlan(bytes, 1L, 2).map(_._1) === Seq(0L, 12L, 24L))
  }

  test("second track's chunk offset sits after the first track's data") {
    val bytes = Mp4Codec.encode(Seq(video, audio))
    val ts = Mp4Codec.parse(bytes).get
    val v = ts.find(_.trackId == 1L).get
    val a = ts.find(_.trackId == 2L).get
    assert(a.firstChunkOffset === v.firstChunkOffset + v.totalBytes)
    // and the whole mdat fits inside the file
    assert(a.firstChunkOffset + a.totalBytes <= bytes.length)
  }

  test("corrupt and truncated payloads parse to None, never throw") {
    assert(Mp4Codec.parse("ftypnot really an mp4".getBytes("UTF-8")).isEmpty)
    assert(Mp4Codec.parse(Array.emptyByteArray).isEmpty)
    val good = Mp4Codec.encode(Seq(video))
    assert(Mp4Codec.parse(good.take(40)).isEmpty)
    // random-ish corruption of the moov region must not throw
    val mangled = good.clone()
    for (i <- good.length - 64 until good.length) mangled(i) = 0x7f
    Mp4Codec.parse(mangled) // may be Some or None — just must not throw
  }

  test("samplePlans: Spark rows equal the local keyframePlan per doc") {
    import spark.implicits._
    val payloads = Seq(
      0L -> Mp4Codec.encode(Seq(video, audio)),
      1L -> Mp4Codec.encode(Seq(video.copy(sampleSizes =
        (0 until 18).map(j => 90 + j)))),
      2L -> "ftypnot an mp4".getBytes("UTF-8")) // emits nothing
    val df = payloads.toDF("doc_id", "payload").repartition(3)
    val got = Mp4Codec.samplePlans(df, 1L, 2).collect()
      .map(p => (p.doc_id, p.sample_idx, p.byte_offset, p.byte_size)).sorted
    val want = payloads.flatMap { case (id, bytes) =>
      Mp4Codec.keyframePlan(bytes, 1L, 2).map { case (j, off, sz) =>
        (id, j, off, sz)
      }
    }.sorted
    assert(got.nonEmpty && got.sameElements(want))
  }

  test("64-bit largesize box header is honored") {
    val inner = Mp4Codec.encode(Seq(video))
    // wrap the whole file in a largesize 'skip' box, then append nothing:
    // parse must skip it by the 64-bit size and still find nothing after —
    // so embed it the other way: largesize skip FIRST, then the real file
    val skipPayload = Array.fill[Byte](10)(0x55)
    val size = 16L + skipPayload.length
    val hdr = Array[Byte](0, 0, 0, 1) ++ "skip".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, (size >> 24).toByte, (size >> 16).toByte,
        (size >> 8).toByte, size.toByte)
    val bytes = hdr ++ skipPayload ++ inner
    val tracks = Mp4Codec.parse(bytes)
    assert(tracks.nonEmpty && tracks.get.head.trackId === 1L)
  }
}
