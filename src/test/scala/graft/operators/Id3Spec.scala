package graft.operators

import graft.SparkSpec

/** ID3 witnesses: v2.3 plain vs v2.4 syncsafe frame sizes (the interop
  * trap, exercised with a >127-byte frame), all four text encodings,
  * padding termination, frame-overrun rejection, v2.2/unsync subset
  * rejection, ID3v1 tails, coexistence with the MP3 frame walk,
  * Spark fan-out.
  */
class Id3Spec extends SparkSpec {

  private val frames = Seq(
    "TIT2" -> "My Title", "TPE1" -> "An Artist",
    "TALB" -> "The Album", "TRCK" -> "7", "TDRC" -> "1999")

  test("v2.3 (plain sizes) and v2.4 (syncsafe sizes) round trip") {
    for (major <- Seq(3, 4)) {
      val big = frames :+ ("TIT3" -> ("x" * 200)) // size > 127 splits the encodings
      val t = Id3.parse(Id3.fixture(major, big)).get
      assert(t.version === s"2.$major")
      assert(t.title === "My Title")
      assert(t.artist === "An Artist")
      assert(t.album === "The Album")
      assert(t.track === "7")
      assert(t.year === "1999")
      assert(t.nFrames === 6)
    }
  }

  test("all four text encodings decode") {
    for (enc <- 0 to 3) {
      val t = Id3.parse(Id3.fixture(4, Seq("TIT2" -> "Same Text"), enc)).get
      assert(t.title === "Same Text", s"encoding $enc")
    }
  }

  test("overrunning frame size rejects; v2.2 and unsync out of subset") {
    val good = Id3.fixture(4, frames)
    // inflate the first frame's declared size beyond the tag
    val bad = good.clone()
    bad(14) = 0x7f.toByte // frame size high byte → overrun
    assert(Id3.parse(bad).isEmpty)
    val v22 = good.clone(); v22(3) = 2
    assert(Id3.parse(v22).isEmpty)
    val unsync = good.clone(); unsync(5) = 0x80.toByte
    assert(Id3.parse(unsync).isEmpty)
    assert(Id3.parse("no tag here".getBytes).isEmpty)
  }

  test("ID3v1 tail fields parse with NUL/space padding stripped") {
    val v1 = new Array[Byte](128)
    "TAG".getBytes.copyToArray(v1, 0)
    "V1 Title".getBytes.copyToArray(v1, 3)
    "V1 Artist".getBytes.copyToArray(v1, 33)
    java.util.Arrays.fill(v1, 63, 93, ' '.toByte) // space-padded empty album
    "1984".getBytes.copyToArray(v1, 93)
    val payload = "leading audio bytes".getBytes ++ v1
    assert(Id3.parseV1(payload) === Some(("V1 Title", "V1 Artist", "", "1984")))
    assert(Id3.parseV1("short".getBytes).isEmpty)
  }

  test("tag prefix coexists with the MP3 frame walk") {
    val tag = Id3.fixture(4, frames)
    val mp3 = Mp3Codec.fixture("1", 3, 44100, 2, Seq(128, 128, 128))
    val combined = tag ++ mp3
    val t = Id3.parse(combined).get
    assert(t.title === "My Title" && t.nFrames === 5)
    val m = Mp3Codec.parse(combined).get
    assert(m.nFrames === 3L && m.id3v2Bytes === tag.length.toLong)
  }

  test("parseTags fans out partition-parallel") {
    import spark.implicits._
    val rows = (0L until 6L).map { i =>
      val payload =
        if (i % 3 == 2) s"untagged $i".getBytes
        else Id3.fixture(if (i % 2 == 0) 3 else 4,
          Seq("TIT2" -> s"Doc $i", "TPE1" -> s"artist${i % 4}"))
      (i, payload)
    }.toDF("doc_id", "payload").repartition(3)
    val ts = Id3.parseTags(rows)(spark).collect().sortBy(_.doc_id)
    assert(ts.map(_.has_tag).toSeq === Seq(true, true, false, true, true, false))
    assert(ts(0).title === "Doc 0" && ts(0).version === "2.3")
    assert(ts(1).version === "2.4")
  }
}
