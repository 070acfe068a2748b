package graft.operators

import graft.SparkSpec

/** 7zFormat grammar witnesses. The commons-compress legs round-trip
  * against an INDEPENDENT encoder (copy / classic LZMA1 / LZMA2 from
  * the xz toolchain on the Spark classpath); the hand-serialized solid
  * leg exercises the layouts that encoder never writes — one folder
  * split into substreams by kSubStreamsInfo, and the header itself
  * packed as a kEncodedHeader folder. Quarantine witnesses: flipped
  * payload byte (substream CRC), flipped packed LZMA2 byte (folder
  * decode), truncated/garbage archives (archive row), unsupported
  * coder (files kept by name).
  */
class SevenZWalkSpec extends SparkSpec {

  private def bytes(s: String) = s.getBytes("UTF-8")

  private val recs = Seq(
    ("docs/a.txt", bytes("alpha alpha alpha alpha")),
    ("docs/b.txt", bytes("the quick brown fox jumps over the lazy dog " * 40)),
    ("c.md", bytes("# heading\nbody text with some entropy 0123456789")))

  test("commons-compress round trip: copy, lzma1 and lzma2 methods") {
    for (m <- Seq("copy", "lzma", "lzma2")) {
      val es = SevenZWalk.entries(SevenZWalk.fixture(recs, m))
      assert(es.map(_.name) === recs.map(_._1), m)
      assert(es.forall(e => !e.corrupt && e.crcOk), m)
      assert(es.map(e => new String(e.data, "UTF-8")) ===
        recs.map(r => new String(r._2, "UTF-8")), m)
      assert(es.map(_.size) === recs.map(_._2.length.toLong), m)
    }
  }

  test("empty file carried via the EmptyStream vector") {
    val es = SevenZWalk.entries(SevenZWalk.fixture(
      Seq(("full.txt", bytes("payload")), ("empty.txt", Array.empty[Byte])), "lzma2"))
    assert(es.map(e => (e.name, e.emptyStream, e.size)) ===
      Seq(("full.txt", false, 7L), ("empty.txt", true, 0L)))
    // kEmptyFile marks it a genuinely empty FILE, not a directory
    assert(es.map(e => (e.name, e.isDir)) ===
      Seq(("full.txt", false), ("empty.txt", false)))
    assert(es.forall(!_.corrupt))
  }

  test("kEmptyFile BEFORE kEmptyStream still parses (order not mandated)") {
    // swap the two adjacent property records (0e 01 es / 0f 01 ef) in
    // the next header of a real fixture and re-patch both CRCs — a
    // parser that sizes kEmptyFile from a not-yet-seen kEmptyStream
    // would desync on this archive
    val a = SevenZWalk.fixture(
      Seq(("full.txt", bytes("payload")), ("empty.txt", Array.empty[Byte])),
      "lzma2").clone()
    def u64le(off: Int): Long = (0 until 8).map(i => (a(off + i) & 0xffL) << (8 * i)).sum
    val hOff = (32L + u64le(12)).toInt
    val hSize = u64le(20).toInt
    var p = -1
    var i = hOff
    while (p < 0 && i < hOff + hSize - 5) {
      if ((a(i) & 0xff) == 0x0e && a(i + 1) == 1 &&
          (a(i + 3) & 0xff) == 0x0f && a(i + 4) == 1) p = i
      i += 1
    }
    assert(p > 0, "fixture header lacks adjacent EmptyStream/EmptyFile records")
    val es = a(p + 2); val ef = a(p + 5)
    a(p) = 0x0f; a(p + 2) = ef // kEmptyFile first
    a(p + 3) = 0x0e; a(p + 5) = es
    def putCrc(off: Int, crc: Long): Unit =
      (0 until 4).foreach(i => a(off + i) = ((crc >> (8 * i)) & 0xff).toByte)
    val c1 = new java.util.zip.CRC32(); c1.update(a, hOff, hSize)
    putCrc(28, c1.getValue)
    val c2 = new java.util.zip.CRC32(); c2.update(a, 12, 20)
    putCrc(8, c2.getValue)
    val out = SevenZWalk.entries(a)
    assert(out.map(e => (e.name, e.emptyStream, e.isDir, e.size)) ===
      Seq(("full.txt", false, false, 7L), ("empty.txt", true, false, 0L)))
    assert(out.forall(!_.corrupt))
  }

  test("directory entries: kEmptyStream without kEmptyFile = isDir") {
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZOutputFile}
    val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    def put(name: String, dir: Boolean, data: Array[Byte]): Unit = {
      val e = new SevenZArchiveEntry()
      e.setName(name); e.setDirectory(dir)
      out.putArchiveEntry(e)
      if (!dir) out.write(data)
      out.closeArchiveEntry()
    }
    put("docs", dir = true, null)
    put("docs/a.txt", dir = false, bytes("alpha"))
    put("docs/empty.txt", dir = false, Array.empty[Byte])
    out.close()
    val a = java.util.Arrays.copyOf(ch.array(), ch.size().toInt)
    val es = SevenZWalk.entries(a)
    assert(es.map(e => (e.name, e.emptyStream, e.isDir, e.size)) === Seq(
      ("docs", true, true, 0L),
      ("docs/a.txt", false, false, 5L),
      ("docs/empty.txt", true, false, 0L)))
    assert(es.forall(!_.corrupt))
  }

  test("directory-only archive: absent kEmptyFile means all-dirs") {
    import org.apache.commons.compress.archivers.sevenz.{SevenZArchiveEntry, SevenZOutputFile}
    val ch = new org.apache.commons.compress.utils.SeekableInMemoryByteChannel()
    val out = new SevenZOutputFile(ch)
    Seq("a", "a/b").foreach { name =>
      val e = new SevenZArchiveEntry()
      e.setName(name); e.setDirectory(true)
      out.putArchiveEntry(e); out.closeArchiveEntry()
    }
    out.close()
    val es = SevenZWalk.entries(
      java.util.Arrays.copyOf(ch.array(), ch.size().toInt))
    assert(es.map(e => (e.name, e.isDir)) === Seq(("a", true), ("a/b", true)))
  }

  test("BCJ x86 + LZMA2 two-coder chain decodes via the bind-pair walk") {
    // a payload dense in E8/E9 call/jmp opcodes with plausible rel32
    // displacements — the shape that makes the BCJ transform actually
    // rewrite bytes (text payloads pass through mostly untouched)
    val rnd = new scala.util.Random(7)
    val code = Array.newBuilder[Byte]
    (0 until 400).foreach { _ =>
      code += (if (rnd.nextBoolean()) 0xe8 else 0xe9).toByte
      val rel = rnd.nextInt(1 << 20) - (1 << 19)
      code += rel.toByte
      code += (rel >> 8).toByte
      code += (rel >> 16).toByte
      code += (if (rel < 0) 0xff else 0x00).toByte
      (0 until rnd.nextInt(7)).foreach(_ => code += rnd.nextInt(256).toByte)
    }
    val payloads = Seq(("bin/a.exe", code.result()),
      ("bin/b.exe", bytes("plain text rides the same chain")))
    val es = SevenZWalk.entries(SevenZWalk.fixtureFiltered(payloads, "bcj"))
    assert(es.map(e => (e.name, e.corrupt, e.crcOk)) ===
      Seq(("bin/a.exe", false, true), ("bin/b.exe", false, true)))
    assert(es(0).data === payloads(0)._2)
    assert(es(1).data === payloads(1)._2)
  }

  test("delta + LZMA2 two-coder chain decodes via the bind-pair walk") {
    // sawtooth samples: the shape delta filters exist for
    val wave = (0 until 3000).map(i => ((i * 7) % 251).toByte).toArray
    val es = SevenZWalk.entries(SevenZWalk.fixtureFiltered(
      Seq(("audio/w.raw", wave)), "delta", deltaDist = 2))
    assert(es.map(e => (e.name, e.corrupt, e.crcOk)) ===
      Seq(("audio/w.raw", false, true)))
    assert(es(0).data === wave)
  }

  test("flipped packed byte in a filtered folder still quarantines by CRC") {
    val payload = bytes("x" * 500)
    val a = SevenZWalk.fixtureFiltered(Seq(("f.bin", payload)), "bcj")
    val at = 40 // inside the packed LZMA2 stream (starts at offset 32)
    a(at) = (a(at) ^ 0x20).toByte
    val es = SevenZWalk.entries(a)
    assert(es.forall(e => e.corrupt || e.name != null))
    assert(es.exists(_.corrupt))
  }

  test("hand-serialized solid folder + encoded header: substream split and CRCs") {
    val es = SevenZWalk.entries(SevenZWalk.fixtureSolid(recs))
    assert(es.map(_.name) === recs.map(_._1))
    assert(es.forall(e => !e.corrupt && e.crcOk))
    assert(es.map(e => new String(e.data, "UTF-8")) ===
      recs.map(r => new String(r._2, "UTF-8")))
  }

  test("flipped payload byte quarantines exactly the first entry, name kept") {
    val es = SevenZWalk.entries(SevenZWalk.fixtureCorrupt(recs))
    assert(es.map(e => (e.name, e.corrupt)) ===
      Seq(("docs/a.txt", true), ("docs/b.txt", false), ("c.md", false)))
    assert(es(0).data === null)
    assert(new String(es(2).data, "UTF-8") === new String(recs(2)._2, "UTF-8"))
  }

  test("flipped packed LZMA2 byte fails that folder only; other folders decode") {
    // one folder per entry under commons-compress: corrupt folder 1's
    // packed stream mid-byte (pack area starts at 32)
    val a = SevenZWalk.fixture(recs, "lzma2")
    val firstPack = SevenZWalk.entries(a) // sanity: clean before flip
    assert(firstPack.forall(!_.corrupt))
    a(40) = (a(40) ^ 0x20).toByte
    val es = SevenZWalk.entries(a)
    assert(es.map(_.name) === recs.map(_._1))
    assert(es(0).corrupt && es(0).data == null)
    assert(!es(2).corrupt &&
      new String(es(2).data, "UTF-8") === new String(recs(2)._2, "UTF-8"))
  }

  test("archive-level corruption: bad magic, truncated tail, flipped header CRC") {
    val good = SevenZWalk.fixture(recs, "copy")
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    val truncated = java.util.Arrays.copyOf(good, good.length - 3)
    val badHeaderCrc = good.clone()
    badHeaderCrc(28) = (badHeaderCrc(28) ^ 0x01).toByte // next-header CRC field
    for (b <- Seq(badMagic, truncated, badHeaderCrc, Array.empty[Byte],
      bytes("definitely not a seven zip archive, far too small anyway"))) {
      val es = SevenZWalk.entries(b)
      assert(es.length === 1 && es.head.corrupt && es.head.name == null)
    }
  }

  test("REAL_UINT64 round-trips across width boundaries via the solid fixture") {
    // a payload > 16384 bytes forces 2-tail-byte numbers in sizes
    val big = Seq(("big.bin", Array.tabulate(20000)(i => (i % 251).toByte)),
      ("tiny.bin", Array[Byte](1, 2, 3)))
    val es = SevenZWalk.entries(SevenZWalk.fixtureSolid(big))
    assert(es.map(e => (e.name, e.size, e.corrupt)) ===
      Seq(("big.bin", 20000L, false), ("tiny.bin", 3L, false)))
    assert(es(0).data.toSeq === big(0)._2.toSeq)
  }

  test("Spark fan-out: parseEntries walks archives partition-parallel") {
    import spark.implicits._
    val arch = (0L until 6L).toSeq.map { id =>
      (id, SevenZWalk.fixture(Seq(
        (s"d/$id-a.txt", bytes(s"alpha $id")),
        (s"d/$id-b.txt", bytes(s"beta $id " * 20))),
        if (id % 2 == 0) "lzma2" else "copy"))
    }
    val df = arch.toDF("doc_id", "payload").repartition(3)
    val out = SevenZWalk.parseEntries(df)(spark).collect().sortBy(e => (e.doc_id, e.name))
    assert(out.length === 12)
    assert(out.forall(!_.corrupt))
    assert(out.filter(_.name.endsWith("-a.txt")).map(_.body_text).toSeq ===
      (0L until 6L).map(id => s"alpha $id"))
  }
}
