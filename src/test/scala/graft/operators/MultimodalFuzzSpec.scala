package graft.operators

import graft.SparkSpec

/** Fuzz the three real decoders with hostile payloads: pure random bytes,
  * bit-flipped valid containers, and truncated valid containers. The
  * contract under test is the decode_ok LADDER — an arbitrary payload may
  * decode or may not, but it must always come back as rows (never a task
  * exception), and every input doc must be accounted for. Mutated RIFF
  * size fields are the interesting case: the AVI walk must survive
  * forged chunk sizes and forged BITMAPINFOHEADER dims. Two defects
  * found while building this spec, both fixed in decodeVideoFrames: the
  * rowBytes·height int overflow on forged dims, and parseable-but-
  * frameless containers yielding ZERO rows (the doc vanished from the
  * output instead of landing on the decode_ok=false ladder).
  */
class MultimodalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(0xc0ffee)

  private def mutate(b: Array[Byte]): Array[Byte] = {
    val out = b.clone()
    val flips = 1 + rnd.nextInt(8)
    for (_ <- 0 until flips) {
      val i = rnd.nextInt(out.length)
      out(i) = (out(i) ^ (1 << rnd.nextInt(8))).toByte
    }
    out
  }

  private def truncate(b: Array[Byte]): Array[Byte] =
    b.take(rnd.nextInt(b.length))

  private def hostile(valid: Seq[Array[Byte]], n: Int): Seq[(Long, Array[Byte])] = {
    val cases = Seq.tabulate(n) { i =>
      i % 4 match {
        case 0 => Array.fill(rnd.nextInt(200))(rnd.nextInt.toByte)
        case 1 => mutate(valid(rnd.nextInt(valid.length)))
        case 2 => truncate(valid(rnd.nextInt(valid.length)))
        case _ => mutate(mutate(valid(rnd.nextInt(valid.length))))
      }
    }
    (cases :+ Array.empty[Byte]).zipWithIndex.map { case (b, i) => (i.toLong, b) }
  }

  test("decodeAudio survives 200 hostile payloads as rows") {
    val valid = Seq(
      Multimodal.syntheticWav(120, 8000, 1, 16),
      Multimodal.syntheticWav(64, 16000, 2, 16),
      Multimodal.syntheticWav(50, 8000, 1, 8))
    val docs = hostile(valid, 200).toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(docs.repartition(8), "doc_id", "payload")
    val got = Multimodal.decodeAudio(media).collect()
    assert(got.length === 201) // exactly one row per doc, good or bad
    assert(got.forall(f => f.decode_ok || f.bits === -1))
  }

  test("decodeImages survives 200 hostile payloads as rows") {
    val valid = Seq(
      Multimodal.syntheticImage(16, 8, "png"),
      Multimodal.syntheticImage(16, 8, "bmp"))
    val docs = hostile(valid, 200).toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(docs.repartition(8), "doc_id", "payload")
    val got = Multimodal.decodeImages(media).collect()
    assert(got.length === 201)
    assert(got.forall(f => f.decode_ok || f.width === -1))
  }

  test("adversarial AVI: 2^31-adjacent chunk sizes and LIST nesting bombs land as rows") {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(i: Int): Array[Byte] =
      ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    // RIFF/AVI header + one chunk whose forged size ≈ 2^31: the Int sum
    // dataOff + size wraps negative and would bypass a 32-bit bounds guard
    val overflow = "RIFF".getBytes("US-ASCII") ++ le(0x7FFFFFF0) ++
      "AVI ".getBytes("US-ASCII") ++ "00db".getBytes("US-ASCII") ++
      le(0x7FFFFFF4) ++ Array.fill(64)(0.toByte)
    // deeply nested LIST bomb: each 12-byte LIST claims to contain the
    // next — 200k levels would overflow the recursion stack if uncapped
    val depth = 200000
    val bomb = new Array[Byte](12 + depth * 12)
    "RIFF".getBytes("US-ASCII").copyToArray(bomb, 0)
    le(bomb.length - 8).copyToArray(bomb, 4)
    "AVI ".getBytes("US-ASCII").copyToArray(bomb, 8)
    var o = 12
    var remaining = bomb.length - 12
    while (remaining >= 12) {
      "LIST".getBytes("US-ASCII").copyToArray(bomb, o)
      le(remaining - 8).copyToArray(bomb, o + 4)
      "hdrl".getBytes("US-ASCII").copyToArray(bomb, o + 8)
      o += 12; remaining -= 12
    }
    val docs = Seq((0L, overflow), (1L, bomb)).toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(docs, "doc_id", "payload")
    val got = Multimodal.decodeVideoFrames(media, everyK = 1).collect()
    assert(got.map(_.doc_id).sorted.toSeq === Seq(0L, 1L))
    assert(got.forall(!_.decode_ok))
  }

  test("decodeVideoFrames survives 300 hostile containers as rows") {
    val valid = Seq(
      Multimodal.syntheticAvi(16, 8, 5),
      Multimodal.syntheticAvi(24, 12, 3),
      Multimodal.syntheticAvi(16, 8, 4, mjpeg = true))
    val docs = hostile(valid, 300).toDF("doc_id", "payload")
    val media = Multimodal.toMediaTable(docs.repartition(8), "doc_id", "payload")
    val got = Multimodal.decodeVideoFrames(media, everyK = 2).collect()
    // every doc yields >= 1 row (parse-fail marker or sampled frames)
    assert(got.map(_.doc_id).distinct.length === 301)
    // sampled indices are always on the stride or the -1 marker
    assert(got.forall(f => f.frame_idx == -1 || f.frame_idx % 2 == 0))
  }
}
