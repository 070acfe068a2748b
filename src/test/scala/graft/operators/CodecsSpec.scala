package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The mixed-format sniffing walk: four formats concatenated in one
  * payload route to the right decoders, skippable frames stay
  * transparent, and a corrupt checksummed member quarantines without
  * poisoning its neighbors.
  */
class CodecsSpec extends AnyFunSuite {

  private def gz(s: String): Array[Byte] = {
    val mem = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(mem)
    g.write(s.getBytes("UTF-8")); g.close()
    mem.toByteArray
  }
  private def zst(s: String): Array[Byte] = {
    val ctx = new com.github.luben.zstd.ZstdCompressCtx()
    try { ctx.setLevel(5); ctx.setChecksum(true); ctx.compress(s.getBytes("UTF-8")) }
    finally ctx.close()
  }
  private def lz4(s: String): Array[Byte] = {
    import net.jpountz.lz4.LZ4FrameOutputStream
    val mem = new java.io.ByteArrayOutputStream()
    val f = new LZ4FrameOutputStream(mem, LZ4FrameOutputStream.BLOCKSIZE.SIZE_64KB,
      s.length.toLong, LZ4FrameOutputStream.FLG.Bits.BLOCK_INDEPENDENCE,
      LZ4FrameOutputStream.FLG.Bits.CONTENT_CHECKSUM)
    f.write(s.getBytes("UTF-8")); f.close()
    mem.toByteArray
  }
  private def snap(s: String): Array[Byte] =
    SnappyCodec.encodeFramed(s.getBytes("UTF-8"))
  private def bz2(s: String): Array[Byte] = {
    val mem = new java.io.ByteArrayOutputStream()
    val z = new org.apache.commons.compress.compressors.bzip2
      .BZip2CompressorOutputStream(mem, 5)
    z.write(s.getBytes("UTF-8")); z.close()
    mem.toByteArray
  }
  private def xz(s: String): Array[Byte] = {
    val mem = new java.io.ByteArrayOutputStream()
    val z = new org.tukaani.xz.XZOutputStream(mem, new org.tukaani.xz.LZMA2Options(4))
    z.write(s.getBytes("UTF-8")); z.close()
    mem.toByteArray
  }

  test("sniffs and decodes all six formats from one concatenation") {
    val skip = {
      val bb = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x184d2a50); bb.putInt(4); bb.putInt(7); bb.array()
    }
    val whole = gz("alpha via gzip") ++ zst("beta via zstd") ++ skip ++
      lz4("gamma via lz4") ++ snap("delta via snappy") ++
      bz2("epsilon via bzip2") ++ xz("zeta via xz")
    val m = Codecs.members(whole)
    assert(m.map(_._2) === Seq("gzip", "zstd", "lz4", "snappy", "bzip2", "xz"))
    assert(m.map(x => new String(x._3, "UTF-8")) ===
      Seq("alpha via gzip", "beta via zstd", "gamma via lz4",
        "delta via snappy", "epsilon via bzip2", "zeta via xz"))
    // offsets are member starts, strictly increasing
    assert(m.map(_._1) === m.map(_._1).sorted)
  }

  test("a corrupt member quarantines; the walk resynchronizes across formats") {
    val z = zst("will be truncated")
    val whole = gz("first ok") ++ z.take(z.length - 5) ++ lz4("after the gap") ++ snap("last ok")
    val m = Codecs.members(whole)
    val bad = m.filter(_._3 == null)
    assert(bad.length === 1 && bad.head._2 === "(corrupt)")
    assert(m.filter(_._3 != null).map(x => new String(x._3, "UTF-8")) ===
      Seq("first ok", "after the gap", "last ok"))
  }

  test("xz directly after snappy: 0xfd magic byte is not eaten as a skippable chunk") {
    // xz's first magic byte (0xfd) lands in snappy framing's SKIPPABLE
    // range; an unsniffled walk would consume the xz header as a bogus
    // 0x587a37-byte skippable chunk and quarantine the valid snappy
    // member. Both adjacency orders must survive.
    val whole = snap("snappy before xz") ++ xz("xz after snappy") ++ snap("snappy tail")
    val m = Codecs.members(whole)
    assert(m.map(_._2) === Seq("snappy", "xz", "snappy"))
    assert(m.map(x => new String(x._3, "UTF-8")) ===
      Seq("snappy before xz", "xz after snappy", "snappy tail"))
    // and the overrun fallback alone (no full 6-byte magic visible —
    // payload truncated right after the 0xfd byte) ends the member
    // leniently instead of failing it
    val truncated = snap("lenient end") ++ Array[Byte](0xfd.toByte)
    val d = SnappyCodec.decodeFramedAt(truncated, 0)
    assert(d.isDefined)
    assert(new String(d.get._1, "UTF-8") === "lenient end")
  }

  test("empty and garbage payloads yield empty / fully-quarantined walks") {
    assert(Codecs.members(Array.emptyByteArray).isEmpty)
    assert(Codecs.members(null).isEmpty)
    val garbage = Array.tabulate[Byte](100)(i => (i * 7).toByte)
    val m = Codecs.members(garbage)
    assert(m.forall(_._3 == null))
  }
}
