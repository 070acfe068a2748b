package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** One hostile-payload contract for EVERY from-spec byte decoder: pure
  * random bytes, bit-flipped valid payloads, and truncated valid
  * payloads. A decoder may decode or may quarantine (None / empty /
  * thrown Exception, per its documented surface), but it must never
  * raise a non-Exception Throwable — StackOverflow from forged
  * recursion, OutOfMemory from forged length fields — the
  * executor-killing classes the quarantine ladders exist to prevent.
  * Complements the per-codec conformance specs and the existing
  * Multimodal / ArrowWalk / MetaFilter fuzz suites. Valid payloads come
  * from the same real/foreign encoders the conformance specs use, so
  * the mutation space sits on genuine format structure.
  */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(0xf422)

  private def mutate(b: Array[Byte]): Array[Byte] = {
    val o = b.clone()
    for (_ <- 0 until 1 + rnd.nextInt(8)) {
      val i = rnd.nextInt(o.length)
      o(i) = (o(i) ^ (1 << rnd.nextInt(8))).toByte
    }
    o
  }

  private def hostile(valid: Seq[Array[Byte]], n: Int): Seq[Array[Byte]] =
    Seq.tabulate(n) { i =>
      val base = valid(i % valid.length)
      i % 4 match {
        case 0 => Array.fill(rnd.nextInt(300))(rnd.nextInt().toByte)
        case 1 => mutate(base)
        case 2 => base.take(rnd.nextInt(base.length))
        case _ => mutate(mutate(base))
      }
    } :+ Array.empty[Byte]

  /** Run the contract: `decode` returns true when the payload decoded,
    * false when it quarantined via its value surface; a thrown Exception
    * counts as a quarantine too. Anything else (Error) fails the test.
    */
  private def contract(name: String, valid: => Seq[Array[Byte]], n: Int = 200)(
      decode: Array[Byte] => Boolean): Unit =
    test(s"$name survives ${n + 1} hostile payloads") {
      var ok = 0; var rejected = 0
      hostile(valid, n).foreach { p =>
        try { if (decode(p)) ok += 1 else rejected += 1 }
        catch { case _: Exception => rejected += 1 }
      }
      assert(ok + rejected === n + 1)
      assert(rejected > 0, "the hostile set never exercised a reject")
    }

  private def bytes(s: String) = s.getBytes("UTF-8")
  private val docA = bytes("fuzz document body one " * 8)
  private val docB = bytes("another payload with text " * 5)

  contract("SevenZWalk.entries",
    Seq(SevenZWalk.fixture(Seq("a.txt" -> docA, "b.txt" -> docB), "lzma2"),
      SevenZWalk.fixture(Seq("c.txt" -> docA), "copy"),
      SevenZWalk.fixtureFiltered(Seq("d.bin" -> docA), "delta")))(
    b => SevenZWalk.entries(b).exists(!_.corrupt))

  contract("ZipWalk.entries",
    Seq(ZipWalk.fixture(Seq(("a.txt", docA, true), ("b.txt", docB, false))),
      ZipWalk.fixture64(Seq(("c.txt", docA, true)))))(
    b => ZipWalk.entries(b).exists(!_.corrupt))

  contract("Warc.records",
    Seq(Warc.fixtureGz(Seq(
      ("http://example.org/1", "response", docA),
      ("http://example.org/2", "response", docB)))))(
    b => Warc.records(b).exists(!_.corrupt))

  contract("Tar.entries",
    Seq(Tar.fixture(Seq("a.txt" -> docA, "dir/b.txt" -> docB))))(
    b => Tar.entries(b).exists(!_.corrupt))

  contract("MimeWalk.parseMbox",
    Seq(MimeWalk.fixture(Seq(
      ("a@example.org", "subject one", "plain body", false),
      ("b@example.org", "subject two", "multi body", true)))))(
    b => MimeWalk.parseMbox(b).nonEmpty)

  contract("PdfCodec.decode",
    Seq(PdfCodec.encode(Seq("page one text", "page two text"), "T"),
      PdfCodec.encodeModern(Seq("modern page"), "M")))(
    b => PdfCodec.decode(b).ok)

  contract("Mp3Codec.parse",
    Seq(Mp3Codec.fixture("1", 3, 44100, 2, Seq.fill(7)(128))))(
    b => Mp3Codec.parse(b).isDefined)

  contract("Mp4Codec.parse",
    Seq(Mp4Codec.encode(Seq(
      Mp4Codec.TrackSpec(1L, video = true, 600L, 100L,
        (0 until 10).map(j => 100 + j), 3, 64, 36)))))(
    b => Mp4Codec.parse(b).isDefined)

  contract("FlacCodec.decode",
    Seq(FlacCodec.encode(Array.tabulate(2048)(i => (i % 256) - 128),
      8000, 1, 16)))(
    b => FlacCodec.decode(b).isDefined)

  contract("Vp8lCodec.decode",
    Seq(Vp8lCodec.encode(8, 8,
      Array.tabulate(64)(i => 0xff000000 | (i * 0x030201)))))(
    b => Vp8lCodec.decode(b).isDefined)

  contract("JpegCodec.decode",
    Seq(JpegCodec.uniformBlockFixture(2, 2, (i, j) => 40 + 10 * i + j),
      JpegCodec.uniformBlock12Fixture(2, 2, (i, j) => 2048 + 16 * i - 32 * j)))(
    b => JpegCodec.decode(b).isDefined)

  contract("ZstdCodec.decode", {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try Seq(ctx.compress(docA)) finally ctx.close()
  })(b => ZstdCodec.decode(b).isDefined)

  contract("Lz4Codec.decode", {
    val mem = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(mem)
    out.write(docA); out.close()
    Seq(mem.toByteArray)
  })(b => Lz4Codec.decode(b).isDefined)

  contract("XzCodec.decode", {
    val mem = new java.io.ByteArrayOutputStream()
    val out = new org.tukaani.xz.XZOutputStream(mem,
      new org.tukaani.xz.LZMA2Options(1))
    out.write(docA); out.close()
    Seq(mem.toByteArray)
  })(b => XzCodec.decode(b).isDefined)

  contract("Bzip2Codec.decode", {
    val mem = new java.io.ByteArrayOutputStream()
    val out = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(mem, 1)
    out.write(docA); out.close()
    Seq(mem.toByteArray)
  })(b => Bzip2Codec.decode(b).isDefined)
}
